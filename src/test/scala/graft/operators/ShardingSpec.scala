package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Sharding]]: the consistent-hashing contract — removing a
  * shard moves ONLY that shard's keys — plus full assignment and
  * determinism. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def asgMap(nShards: Int): Map[Long, Long] = {
    val keys = (1L to 200L).toDF("doc_id")
    val ring = Sharding.ring(spark, nShards, vnodesPerShard = 16)
    Sharding.assign(keys, "doc_id", ring).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
  }

  test("every key is assigned exactly once, to a valid shard") {
    val a = asgMap(8)
    assert(a.size == 200 && a.values.forall(s => s >= 0 && s < 8))
  }

  test("removing a shard moves ONLY that shard's keys") {
    val with8 = asgMap(8)
    // shards 0..6 of an 8-shard ring are exactly the 7-shard ring
    // (vnode positions depend only on (shard, vnode, salt))
    val with7 = asgMap(7)
    val moved = with8.filter { case (k, s) => with7(k) != s }
    assert(moved.values.toSet.subsetOf(Set(7L)),
      s"keys moved off surviving shards: ${moved.take(5)}")
    assert(with8.count(_._2 == 7L) == moved.size) // all of 7's keys moved
  }

  test("assignment is deterministic across invocations") {
    assert(asgMap(8) == asgMap(8))
  }
}
