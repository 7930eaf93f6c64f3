package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Z-order interleave correctness and layout-assignment properties. */
class LayoutSpec extends SparkSpec with Matchers {

  /** Reference Morton code: bit i of x → position 2i, y → 2i+1. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave over the 8-bit square") {
    import spark.implicits._
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect()
    out.foreach { r =>
      r.getLong(2) shouldBe morton(r.getLong(0), r.getLong(1), 8)
    }
  }

  test("zValue is a bijection on the bits-square (no collisions)") {
    import spark.implicits._
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 5).as("z"))
      .collect().map(_.getLong(0))
    zs.distinct.length shouldBe 1024
    zs.max shouldBe 1023L
  }

  test("zorderAssign: file ids cover [0, files), are monotone in z, and balance") {
    import spark.implicits._
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val out = Layout.zorderAssign(pts, "x", "y", bits = 6, files = 8)
      .select("z", "file_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    out.map(_._2).min shouldBe 0
    out.map(_._2).max shouldBe 7
    // Monotone: sorting by z never decreases file_id.
    val byZ = out.sortBy(_._1).map(_._2)
    byZ.zip(byZ.tail).foreach { case (a, b) => a should be <= b }
    // Value-range split of a dense square is near-uniform.
    val sizes = out.groupBy(_._2).map(_._2.length)
    sizes.max - sizes.min should be <= 1
  }

  test("z-locality: nearby points land in the same or adjacent file") {
    import spark.implicits._
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val out = Layout.zorderAssign(pts, "x", "y", bits = 6, files = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    // An axis-aligned neighbor differs by ≤ 1 file for the vast
    // majority of points (z-curve locality is statistical, not exact).
    val jumps = (for (x <- 0L until 63L; y <- 0L until 64L) yield
      math.abs(out((x + 1, y)) - out((x, y))))
    jumps.count(_ > 1).toDouble / jumps.size should be < 0.02
  }
}
