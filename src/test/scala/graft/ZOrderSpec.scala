package graft

import java.nio.file.Files

import graft.functions.ZOrder
import graft.sources.Sources
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue column matches the plain-Scala bit-interleave reference") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue))) ++
      Seq((0, 0), (1, 0), (0, 1), (Int.MaxValue, Int.MaxValue))
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[(Int, Int, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z == ZOrder.zValueRef(a, b), s"mismatch at ($a, $b)")
    }
  }

  test("z-ordered layout prunes files on BOTH axes; single-sort only on one") {
    val n = 1 << 14
    val df = spark.range(n).select(
      pmod(hash(col("id")), lit(256)).cast("int").as("a"),
      pmod(hash(col("id") + 1000000), lit(256)).cast("int").as("b"))

    val base = Files.createTempDirectory("graft_zorder").toString
    Sources.writeZOrdered(df, s"$base/z", "a", "b", files = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$base/lin")

    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val zdir = s"$base/z"; val ldir = s"$base/lin"
    // same rows in both layouts
    assert(spark.read.parquet(zdir).count() == n)
    assert(spark.read.parquet(ldir).count() == n)

    val predA = col("a") < 64  // top-quarter-aligned range on a
    val predB = col("b") < 64  // same on b
    val zA = filesTouched(zdir, predA)
    val zB = filesTouched(zdir, predB)
    val linA = filesTouched(ldir, predA)
    val linB = filesTouched(ldir, predB)

    // single-sort: perfect on its own axis, no locality on the other
    assert(linA <= 6, s"a-sorted layout should localize a (got $linA files)")
    assert(linB >= 14, s"a-sorted layout spreads b over every file (got $linB)")
    // z-order: bounded on BOTH axes (top-2 bits of each land in the
    // file-splitting prefix: ~4 of 16 files, allow boundary spill)
    assert(zA <= 8, s"z layout should bound a-predicates (got $zA files)")
    assert(zB <= 8, s"z layout should bound b-predicates (got $zB files)")
  }
}
