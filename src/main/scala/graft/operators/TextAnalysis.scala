package graft.operators
import graft.QuerySpec
object TextAnalysis {
  val specs: Seq[QuerySpec] = Seq.empty
}
