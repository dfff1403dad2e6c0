package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("NGramMd5Prefixes equals the composed substr/md5/conv spelling per window") {
    // unicode (multi-byte), ascii, repeated grams, shorter-than-n, empty
    val texts = Seq("the cat sat", "aaaa", "héllo wörld", "日本語のテキスト",
      "ab", "", "x", "mixed ascii と 漢字 rows")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
    for (n <- 1 to 6) {
      val composed = df.select(col("id"),
          when(length(col("txt")) >= n,
            transform(sequence(lit(1), length(col("txt")) - n + 1),
              i => conv(substring(md5(col("txt").substr(i, lit(n))), 1, 15),
                16, 10).cast("long")))
            .otherwise(array().cast("array<long>")).as("g"))
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      val native = df.select(col("id"),
          NGramMd5Prefixes.ngramMd5(col("txt"), n).as("g"))
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      assert(native == composed, s"n=$n windowed md5 keys must be bit-identical")
    }
  }

  test("NGramMd5Prefixes null in, null out") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ab")))
      .toDF("id", "txt")
    val out = df.select(col("id"),
        NGramMd5Prefixes.ngramMd5(col("txt"), 2).as("g"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }
}
