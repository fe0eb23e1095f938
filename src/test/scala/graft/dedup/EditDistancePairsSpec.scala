package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q138's blocking claim, proven against brute force: the dual
  * (first-char, last-char) equi-join blocking with a +-1 length band
  * finds EVERY levenshtein<=1 pair over terms of length >= 2 — edits
  * at the front, middle, and end, of all three kinds — and the plan
  * never degrades to a cartesian/BNLJ.
  */
class EditDistancePairsSpec extends SparkSpec {

  // classic DP edit distance — the ground-truth kernel for brute force
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // edits of every kind at every position, plus decoys at distance 2
  private val vocab = Seq(
    "cat", "bat",   // substitution at 0 (last char preserved)
    "car",          // substitution at end vs cat
    "cut",          // substitution mid vs cat
    "cats",         // insert at end
    "scat",         // insert at front (suffix relation)
    "at",           // delete at front
    "ca",           // delete at end
    "dog", "dig",   // separate cluster
    "dogs",
    "fish",         // singleton
    "bird", "birds",
    "x", "y",       // length-1: excluded by contract
    "mouse", "moose" // substitution mid, longer
  )

  private def mined(): Set[(String, String)] = {
    val spark0 = spark
    import spark0.implicits._
    Dedup.editDistancePairs(vocab.toDF("w"), "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("exactly the brute-force lev<=1 pairs over len>=2 terms — complete and sound") {
    val eligible = vocab.distinct.filter(_.length >= 2)
    val truth = (for {
      a <- eligible; b <- eligible if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(truth.nonEmpty && truth.size >= 8, s"fixture too weak: $truth")
    assert(mined() == truth,
      s"missing=${truth -- mined()} extra=${mined() -- truth}")
  }

  test("length-1 terms are excluded by contract") {
    assert(!mined().exists { case (a, b) => a.length < 2 || b.length < 2 })
  }

  test("plan is blocked equi-joins — no cartesian, no BNLJ") {
    val spark0 = spark
    import spark0.implicits._
    val df = Dedup.editDistancePairs(vocab.toDF("w"), "w")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
