package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(MisraGriesAgg.misraGries(col("term"), cap).as("sk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))

  test("guarantee: every item above N/(cap+1) survives an adversarial singleton flood") {
    val spark0 = spark
    import spark0.implicits._
    // 1000x hot1 + 500x hot2 drowned in 5000 distinct singletons that
    // force constant decrement-all churn; N=6500, cap=9 -> threshold 650
    val rows = Seq.fill(1000)("hot1") ++ Seq.fill(500)("hot2") ++
      (0 until 5000).map(i => s"cold-$i")
    val df = rows.toDF("term").repartition(8)
    val sk = sketch(df, cap = 9).toMap
    assert(sk.size <= 9)
    assert(sk.contains("hot1"), s"hot1 (1000 > 6500/10) must survive: $sk")
    // estimates underestimate by at most N/(cap+1)
    val truth = Map("hot1" -> 1000L, "hot2" -> 500L).withDefaultValue(1L)
    sk.foreach { case (t, est) =>
      assert(est <= truth(t) && truth(t) - est <= 650,
        s"estimate for $t out of bounds: est=$est true=${truth(t)}")
    }
  }

  test("merge across partitionings preserves the guarantee and the capacity bound") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c") ++
      (0 until 400).map(i => s"x-$i")
    // N=1000, cap=4 -> threshold 200: 'a' (300) guaranteed, 'b' borderline (=200, not >)
    Seq(1, 3, 16).foreach { p =>
      val sk = sketch(rows.toDF("term").repartition(p), cap = 4).toMap
      assert(sk.size <= 4, s"p=$p exceeded capacity: $sk")
      assert(sk.contains("a"), s"p=$p lost the guaranteed heavy hitter: $sk")
      assert(sk("a") <= 300 && 300 - sk("a") <= 200, s"p=$p bound broken: $sk")
    }
  }

  test("eval is deterministic and ordered (est desc, term asc); nulls skipped") {
    val spark0 = spark
    import spark0.implicits._
    val df = (Seq.fill(5)(Some("z")) ++ Seq.fill(5)(Some("a")) ++
      Seq.fill(2)(Some("m")) ++ Seq(None, None)).toDF("term")
    val sk = sketch(df, cap = 10)
    assert(sk == Seq("a" -> 5L, "z" -> 5L, "m" -> 2L))
  }

  test("exact small stream: below-capacity input is counted exactly") {
    val spark0 = spark
    import spark0.implicits._
    val sk = sketch(Seq("p", "q", "p", "r", "p", "q").toDF("term"), cap = 8).toMap
    assert(sk == Map("p" -> 3L, "q" -> 2L, "r" -> 1L))
  }
}
