package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("withPosition assigns contiguous 1-based positions in sort order") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(7) // scatter before the sort so positions cross partitions
      .orderBy(col("k").desc)
    val pos = Ranking.withPosition(df, "p").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("p"))).toMap
    assert(pos(100L) == 1L && pos(1L) == 100L && pos(57L) == 44L)
    assert(pos.values.toSeq.sorted == (1L to 100L))
  }

  test("withRunningSums matches a sequential prefix sum across partitions") {
    val rows = (1 to 1000).map(i => (i.toLong, (i % 7).toLong, (i % 3).toLong))
    val df = rows.toDF("k", "a", "b").repartition(8).orderBy("k")
    val out = Ranking.withRunningSums(df, Seq("a", "b")).collect()
      .map(r => (r.getAs[Long]("k"), (r.getAs[Long]("cum_a"), r.getAs[Long]("cum_b"))))
      .toMap
    var (ca, cb) = (0L, 0L)
    rows.foreach { case (k, a, b) =>
      ca += a; cb += b
      assert(out(k) == ((ca, cb)), s"at k=$k")
    }
  }

  test("withRunningSums skips nulls (cum advances by 0) like a SUM window") {
    val df = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 7L))
      .toDF("k", "a").orderBy("k")
    val cums = Ranking.withRunningSums(df, Seq("a")).orderBy("k")
      .select("cum_a").as[Long].collect().toSeq
    assert(cums == Seq(5L, 5L, 12L))
  }
}
