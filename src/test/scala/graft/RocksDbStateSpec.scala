package graft

/** The stateful-streaming scale path: HDFS-backed state keeps every
  * key's state on the executor HEAP, which caps a 100 TB
  * sessionization run at whatever fits in memory; production Spark
  * runs large state on the RocksDB state store (bundled — spills to
  * local disk, bounded heap). The engine's stateful operators must be
  * provider-agnostic: this spec runs the flatMapGroupsWithState
  * sessionizer under RocksDB and requires results identical to the
  * default provider, so the scale knob is a pure config flip, proven,
  * not a hope.
  */
class RocksDbStateSpec extends SparkSpec {

  test("sessionization under the RocksDB state store matches the default") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    def run(): Seq[Seq[Any]] =
      streaming.EventsStreaming.sessionizeViaStream(spark, sf)
        .collect().map(_.toSeq).toSeq

    val default = run()
    assert(default.nonEmpty)
    val prev = util.Try(spark.conf.get(key)).toOption
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val rocks = run()
      assert(rocks === default,
        "RocksDB state store changed the sessionization result")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
