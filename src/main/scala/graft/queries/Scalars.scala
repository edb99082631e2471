package graft.queries
import graft.Q
object Scalars {
  val all: Vector[Q] = Vector()
}
