package graft.operators
import graft.QuerySpec
object SkiQueries {
  val specs: Seq[QuerySpec] = Seq.empty
}
