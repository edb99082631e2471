package graft.queries
import graft.Q
object TextOps {
  val all: Vector[Q] = Vector()
}
