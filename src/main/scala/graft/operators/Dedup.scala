package graft.operators
import graft.QuerySpec
object Dedup {
  val specs: Seq[QuerySpec] = Seq.empty
}
