package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Production state-backend parity: the stateful streaming members must
  * produce identical results on the RocksDB state store — the provider a
  * real deployment uses once keyed state outgrows executor heap (the
  * default HDFS-backed store holds every key's state in memory; RocksDB
  * spills to local disk, which is what makes 10^9-user session state
  * feasible on a 1000-executor cluster).
  */
class StateStoreSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def run(provider: Option[String]): Set[(Long, Long, Long, Long)] = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
    provider.foreach(p =>
      b.config("spark.sql.streaming.stateStore.providerClass", p))
    val s = b.getOrCreate()
    try SessionStream.sessions(s, sf, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    finally {
      // restore the default session for other suites sharing the JVM
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      base.newSession()
      ()
    }
  }

  test("RocksDB state store produces the identical session set") {
    val default = run(None)
    val rocks = run(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(default.nonEmpty, "empty session set from the default store")
    assert(rocks == default,
      s"RocksDB minus default: ${(rocks -- default).take(3)}; " +
        s"default minus RocksDB: ${(default -- rocks).take(3)}")
  }
}
