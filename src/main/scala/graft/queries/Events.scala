package graft.queries
import graft.Q
object Events {
  val all: Vector[Q] = Vector()
}
