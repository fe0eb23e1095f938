package graft

/** Constrained-memory spill gate: forks [[SpillProbe]] into a 512 MB
  * JVM (Spark's floor is 450 MB) where the 3M-row global sort, the
  * 300k-group string aggregation, and the forced sort-merge join
  * cannot possibly fit execution memory, then asserts the shapes
  * SPILLED (pressure was real, metrics > 0) and that every checksum
  * matches the roomy in-process session byte-for-byte — graceful
  * degradation, not just fast-path correctness. The two runs also
  * deliberately differ in shuffle.partitions (3 vs the suite's 32),
  * so the checksums' partition-independence is exercised too.
  */
class SpillGateSpec extends SparkSpec {

  private val N = 3000000L

  /** Fork [[SpillProbe]] at -Xmx512m with the given args and return
    * its JSON contract line. */
  private def forkProbe(args: String*): com.fasterxml.jackson.databind.JsonNode = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx512m", "-cp", System.getProperty("java.class.path"),
      "graft.SpillProbe") ++ args
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
    val stdout = new Thread(() =>
      scala.io.Source.fromInputStream(proc.getInputStream)
        .getLines().foreach(l => out.synchronized { out.append(l).append('\n') }))
    val stderrDrain = new Thread(() =>
      scala.io.Source.fromInputStream(proc.getErrorStream).getLines().foreach(_ => ()))
    stdout.start(); stderrDrain.start()
    val finished = proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    assert(finished, "spill probe did not finish within 10 minutes")
    stdout.join(10000); stderrDrain.join(10000)
    assert(proc.exitValue() == 0, s"probe exited ${proc.exitValue()}:\n$out")
    val line = out.toString.linesIterator
      .find(_.startsWith("{")).getOrElse(fail(s"no JSON line in:\n$out"))
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
  }

  test("heavy shapes under a 512MB heap spill and stay exact") {
    val j = forkProbe(N.toString)
    val line = j.toString
    assert(j.path("heap_max_mb").asLong() <= 520, line) // the cap held
    assert(j.path("sorted").asBoolean(), s"constrained sort lost order: $line")
    assert(j.path("spilled_bytes").asLong() > 0L,
      s"no spill under a 512MB heap — the pressure fixture is too small: $line")

    // roomy truth, same pure fixture functions, this suite's session
    val df = SpillProbe.wideRows(spark, N)
    val (roomySort, roomyOrdered) = SpillProbe.globalSort(df)
    assert(roomyOrdered)
    assert(j.path("sort_sum").asLong() == roomySort,
      s"sort diverged under memory pressure: $line vs $roomySort")
    assert(j.path("agg_sum").asLong() == SpillProbe.wideAgg(df),
      s"aggregation diverged under memory pressure: $line")
    assert(j.path("join_sum").asLong() == SpillProbe.smjJoin(df),
      s"join diverged under memory pressure: $line")
  }

  test("a durable-store build (near-dedup band join) under a 512MB heap spills and serves identically") {
    // the foreachBatch append path had never run memory-constrained:
    // fork the near-dedup store build (minhash object aggregation over
    // the exploded shingle table + the band join against the whole
    // seed history) at the floor heap, gate spill > 0 AND the served
    // store byte-identical to this suite's roomy build — the
    // partition-independent checksums compare across local[2]/3-
    // partition (forked) vs local[32]/32-partition (suite) runs.
    val n = 400000L
    val j = forkProbe("store", n.toString)
    val line = j.toString
    assert(j.path("heap_max_mb").asLong() <= 520, line)
    assert(j.path("spilled_bytes").asLong() > 0L,
      s"no spill under a 512MB heap — the store fixture is too small: $line")
    val dir = java.nio.file.Files
      .createTempDirectory("spill_store_roomy").toString + "/index"
    val (survivorsSum, docsSum, bandsSum) =
      SpillProbe.dedupStoreBuild(spark, n, dir)
    assert(j.path("survivors_sum").asLong() == survivorsSum,
      s"survivor set diverged under memory pressure: $line vs $survivorsSum")
    assert(j.path("docs_sum").asLong() == docsSum,
      s"served docs diverged under memory pressure: $line vs $docsSum")
    assert(j.path("bands_sum").asLong() == bandsSum,
      s"served bands diverged under memory pressure: $line vs $bandsSum")
  }
}
