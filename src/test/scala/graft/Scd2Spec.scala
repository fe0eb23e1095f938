package graft

/** q141's interval semantics as executable invariants at sf0.001 —
  * the run-length compression and interval-chaining properties the
  * DuckDB oracle cannot state directly (it re-derives the same rows;
  * these assert the CONTRACT of any SCD2 build).
  */
class Scd2Spec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q141_scd2_intervals")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5)))

  test("exactly one open (is_current) interval per user, and it is the last") {
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val open = ivs.filter(_._6)
      assert(open.length == 1, s"user $u has ${open.length} open intervals")
      assert(open.head._2 == ivs.map(_._2).max,
        s"user $u: open interval is not the last run")
      assert(open.head._5.isEmpty, s"user $u: open interval has valid_to")
    }
  }

  test("intervals chain without gaps or overlaps: valid_to == next valid_from") {
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      ivs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4),
            s"user $u: interval ${a._2} ends at ${a._5}, next starts ${b._4}")
        case _ => ()
      }
    }
  }

  test("runs are maximal: consecutive intervals never carry the same value") {
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      ivs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3,
          s"user $u: adjacent runs ${a._2}/${b._2} share value '${a._3}' — " +
            "run-length compression failed")
        case _ => ()
      }
    }
  }

  test("interval count equals the change-point count of the raw sequence") {
    import org.apache.spark.sql.functions._
    val ev = Tables.table(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .collect()
      .map { r =>
        val i = r.getTimestamp(3).toInstant
        // full micro precision — ms-truncated ordering could disagree
        // with the query's timestamp ordering on sub-ms neighbors
        (r.getLong(0), r.getLong(1), r.getString(2),
          i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
      .groupBy(_._1)
    ev.foreach { case (u, es) =>
      val seq = es.sortBy(e => (e._4, e._2)).map(_._3)
      val nRuns = seq.foldLeft((0, Option.empty[String])) {
        case ((n, prev), v) =>
          if (prev.contains(v)) (n, prev) else (n + 1, Some(v))
      }._1
      assert(rows.count(_._1 == u) == nRuns, s"user $u: run count mismatch")
    }
  }
}
