package graft.queries
import graft.Q
object MultimodalOps {
  val all: Vector[Q] = Vector()
}
