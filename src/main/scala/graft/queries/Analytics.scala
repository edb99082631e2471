package graft.queries
import graft.Q
object Analytics {
  val all: Vector[Q] = Vector()
}
