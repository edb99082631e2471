package graft.queries
import graft.Q
object StreamingOps {
  val all: Vector[Q] = Vector()
}
