package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity contract for the native SimHash expression: identical to the
  * composed-Column form on every input, under both eval paths. */
class SimHash32Spec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[Seq[Long]] = Seq(
    Seq(0L),
    Seq(0xFFFFFFFFL),
    Seq(1L, 2L, 4L, 8L),
    Seq(3L, 3L, 5L),                       // majority across shared bits
    (1L to 200L).map(i => i * 2654435761L % 4294967311L), // pseudo-random
    Seq.empty[Long])

  test("native simhash matches the composed-Column form on all cases") {
    val df = cases.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "sh")
    val both = df.select(col("id"),
      Hashing.simhash(col("sh"), 32).as("native"),
      Hashing.simhashComposed(col("sh"), 32).as("composed"),
      Hashing.simhash(col("sh"), 16).as("native16"),
      Hashing.simhashComposed(col("sh"), 16).as("composed16"))
    both.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"case ${r.getInt(0)} 32-bit")
      assert(r.getLong(3) == r.getLong(4), s"case ${r.getInt(0)} 16-bit")
    }
  }

  test("native minhash signature matches the composed-Column form") {
    val df = cases.filter(_.nonEmpty).zipWithIndex
      .map { case (a, i) => (i, a) }.toDF("id", "sh")
    val both = df.select(col("id"),
      Hashing.minhashSignature(col("sh"), 8).as("native"),
      Hashing.minhashComposed(col("sh"), 8).as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"case ${r.getInt(0)}")
    }
  }

  test("interpreted eval path agrees with codegen") {
    val df = cases.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "sh")
    val expected = df.select(col("id"), Hashing.simhash(col("sh"), 32).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(col("id"), Hashing.simhash(col("sh"), 32).as("h"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(interp == expected)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
