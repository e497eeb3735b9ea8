package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: bit j of dim i lands at j*k + i") {
    val df = Seq((3L, 0L), (0L, 3L), (2L, 1L), (3L, 3L)).toDF("x", "y")
    val z = df.select(Layout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect()
    // x bits at even positions, y bits at odd:
    assert(z(0) == 5L)  // x=0b11 -> 0b0101
    assert(z(1) == 10L) // y=0b11 -> 0b1010
    assert(z(2) == 6L)  // x=0b10,y=0b01 -> z bit2(x1)=1? 0b0110
    assert(z(3) == 15L)
  }

  test("same-quadrant points share the z prefix") {
    val pts = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val zs = Layout.withZValue(pts, Seq("x", "y"), bitsPerDim = 4)
      .select("x", "y", "__z").collect()
      .map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt, r.getLong(2)))
    zs.foreach { case (x, y, z) =>
      val quadrant = ((y >> 3) << 1) | (x >> 3)
      assert((z >> 6).toInt == quadrant, s"($x,$y) z=$z")
    }
  }

  test("null dims cluster at z = -1") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((1.0, 2.0), (null, 2.0))
      .toDF("x", "y")
    val zs = Layout.withZValue(df, Seq("x", "y")).select("__z").as[Long].collect()
    assert(zs.contains(-1L))
  }

  test("z-order write produces files with compact bounding boxes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val pts = (for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toDouble, y.toDouble, x * 100L + y)).toDF("x", "y", "id")
    Layout.zorderWrite(pts, Seq("x", "y"), dir, nFiles = 16, bitsPerDim = 8)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    assert(boxes.length >= 8, s"expected >=8 files, got ${boxes.length}")
    // a contiguous z-range covering ~1/16 of the curve is a compact box,
    // EXCEPT the few files straddling a quadrant seam (whose union box is
    // wide) — so bound the AVERAGE area hard and each file loosely
    val areas = boxes.map(r => r.getDouble(1) * r.getDouble(2))
    assert(areas.sum / areas.length <= 99.0 * 99.0 / 4.0,
      s"mean box area ${areas.sum / areas.length}")
    areas.foreach(a => assert(a <= 99.0 * 99.0 / 1.5, s"file box area $a"))
    // pruning effect: a 10x10 box query touches a minority of files
    val touched = spark.read.parquet(dir)
      .filter(col("x").between(40, 49) && col("y").between(40, 49))
      .select(input_file_name()).distinct().count()
    assert(touched <= boxes.length / 2, s"box query touched $touched/${boxes.length} files")
  }
}
