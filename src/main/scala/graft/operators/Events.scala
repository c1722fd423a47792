package graft.operators
import graft.QuerySpec
object Events {
  val specs: Seq[QuerySpec] = Seq.empty
}
