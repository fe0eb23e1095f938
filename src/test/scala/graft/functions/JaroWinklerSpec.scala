package graft.functions

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** JaroWinklerSim: literal reference values (cross-checked against
  * DuckDB's jaro_winkler_similarity, which q149's oracle compares
  * against bit-for-bit), both kernel paths (<=64-byte bitmask and the
  * array fallback), the DuckDB empty-string convention, and the q149
  * blocking plan shape (bounded equi-join, never cartesian/BNLJ).
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = {
    import org.apache.spark.unsafe.types.UTF8String
    JaroWinklerSim.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))
  }

  test("classic reference values, bit-exact") {
    // literals are DuckDB 1.0.0 outputs (= the standard Winkler 1990
    // definition); q149's oracle depends on byte-for-byte agreement
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("duane", "dwayne") == 0.8400000000000001)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("DuckDB empty-string convention: any empty side is 0.0, even both") {
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0) // textbook says 1.0; DuckDB (and the oracle) say 0.0
  }

  test("array fallback path (>64 bytes) agrees with the reference values") {
    val a70 = "a" * 70
    assert(jw(a70 + "xyz", a70 + "xzy") == 0.9972602739726028)
    val s1 = "the quick brown fox jumps over the lazy dog and keeps on running far"
    val s2 = "the quick brown fox jumps over the lazy dog and keeps on running faz"
    assert(jw(s1, s2) == 0.9941176470588236)
  }

  test("boundary between kernels: 64- and 65-byte strings agree with each other's path") {
    // same logical comparison shifted across the bitmask/array boundary
    // must produce the same score (the two kernels implement one function)
    def pad(n: Int, tail: String) = ("x" * n) + tail
    for (n <- Seq(60, 61, 62)) {
      val small = jw(pad(n, "abcd"), pad(n, "abdc")) // <= 64 and crossing
      assert(small > 0.99 && small < 1.0)
    }
    assert(jw(pad(60, "abcd"), pad(61, "abcd")) == jw(pad(61, "abcd"), pad(60, "abcd")),
      "symmetry across unequal lengths at the boundary")
  }

  test("symmetry on random-ish pairs") {
    val words = Seq("alpha", "alpham", "aplha", "betagamma", "betagama", "x")
    for (a <- words; b <- words)
      assert(jw(a, b) == jw(b, a), s"asymmetric for ($a, $b)")
  }

  test("expression evaluates inside a plan (codegen path) and matches the kernel") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        JaroWinklerSim.jaroWinklerSim(col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
  }

  test("null inputs yield null") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq((Option("abc"), Option.empty[String]), (None, Some("x")))
      .toDF("a", "b")
      .select(JaroWinklerSim.jaroWinklerSim(col("a"), col("b")).as("jw"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("jaroWinklerBestMatch: blocked linkage semantics + no cartesian in the plan") {
    val spark0 = spark
    import spark0.implicits._
    val recs = Seq(
      (1L, "acme corp"),       // block "acme"
      (2L, "acme corq"),       // jw(corp-name pair) high — mutual best match
      (3L, "acme holdings"),   // same block but outside the +-2 length band
      (4L, "zenith ltd"),      // identical names collapse to ONE vocab entry
      (5L, "zenith ltd"),      //   -> no self-pair, n_rows carries the support
      (6L, "zenith ltq")
    ).toDF("id", "name")
    val out = Dedup.jaroWinklerBestMatch(recs, "name", thresholdMicros = 900000L)
    val plan = out.queryExecution.executedPlan
    assert(plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }.isEmpty, "blocking must stay a bounded equi-join")
    val m = out.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(m("acme corp")._1 == "acme corq")
    assert(m("acme corq")._1 == "acme corp")
    assert(!m.contains("acme holdings"), "outside length band / below threshold")
    val (mk, jw1, _, support) = m("zenith ltd")
    assert(mk == "zenith ltq" && jw1 < 1000000L, "no identical-name self matches")
    assert(support == 2L, "n_rows carries the collapsed record support")
    assert(m("acme corp")._4 == 1L)
  }
}
