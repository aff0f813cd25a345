package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one key — the classic hot-key shape
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted agg equals plain agg for sum/count merge") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 5 else 7L, i.toDouble))
      .toDF("k", "x")
    val plain = df.groupBy("k")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(df, "k", salt = 8,
      partials = Seq(sum("x").as("ps"), count(lit(1)).as("pn")),
      finals = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(salted.map(t => (t._1, t._3)).sameElements(plain.map(t => (t._1, t._3))))
    salted.zip(plain).foreach { case (s, p) => assert(math.abs(s._2 - p._2) < 1e-6) }
  }

  test("salting actually spreads the hot key across subkeys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (42L, i)).toDF("k", "v")
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key occupied only $salts subkeys of 8")
  }
}
