package graft.queries
import graft.Q
object VectorOps {
  val all: Vector[Q] = Vector()
}
