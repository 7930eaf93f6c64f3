package graft.join

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec with Matchers {

  private def frames = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // heavily skewed: 80% of rows on key 7
    val big = (1 to 500).map { i =>
      (if (rnd.nextDouble() < 0.8) 7L else rnd.nextInt(20).toLong, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L to 19L).map(k => (k, s"name_$k")).toDF("k2", "name")
    (big, dim)
  }

  test("salted inner join equals the plain join") {
    val (big, dim) = frames
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = canon(big.join(dim, big("k") === dim("k2")))
    val salted = canon(SaltedJoin.join(big, dim, Seq("k" -> "k2"), saltFactor = 8))
    salted shouldBe plain
    plain.count(_._1 == 7L) should be > 300 // the skew is real
  }

  test("salted left join keeps unmatched skewed-side rows exactly once") {
    val (big, dim) = frames
    val dimMissing = dim.filter(col("k2") =!= 7L) // hot key has no match
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    val plain = canon(big.join(dimMissing, big("k") === dimMissing("k2"), "left"))
    val salted = canon(SaltedJoin.join(big, dimMissing, Seq("k" -> "k2"), 8, "left"))
    salted shouldBe plain
    plain.count(r => r._1 == 7L && r._3.isEmpty) should be > 300
  }

  test("right/full joins are rejected") {
    val (big, dim) = frames
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin.join(big, dim, Seq("k" -> "k2"), 8, "right")
  }
}
