package graft.operators
import graft.QuerySpec
object Similarity {
  val specs: Seq[QuerySpec] = Seq.empty
}
