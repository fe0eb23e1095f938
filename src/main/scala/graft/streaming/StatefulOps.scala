package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators (SURVEY.md §2.5 A1/A2, §2.8).
  *
  * Two implementations of the Faust/KSQL "continuously updated keyed
  * table":
  *  - declarative (`groupBy.agg(last/max_by)`) — preferred: Catalyst
  *    plans StateStoreRestore/Save with partial aggregation, scales by
  *    hash-partitioning on the key;
  *  - `mapGroupsWithState` — for genuinely imperative per-key state the
  *    declarative form can't express.
  */
object StatefulOps {

  /** A1: streaming COUNT(*) per key (KSQL turnstile table). Run with
    * `outputMode(Update)` for changelog semantics. */
  def countByKey(df: DataFrame, key: String, keyAlias: String, cntAlias: String): DataFrame =
    df.groupBy(col(key).as(keyAlias)).agg(count(lit(1)).as(cntAlias))

  /** A2 declarative: latest value per key ordered by a monotone column.
    * `max_by` is a declarative aggregate -> partial agg + state store. */
  def latestPerKey(df: DataFrame, key: String, ord: String): DataFrame = {
    val others = df.columns.filter(c => c != key && c != ord).toSeq
    df.groupBy(col(key))
      .agg(max(col(ord)).as(ord), others.map(c => max_by(col(c), col(ord)).as(c)): _*)
  }

  /** Watermarked windowed aggregation (tumbling when slide == window).
    * The reference keeps only global per-key aggregates (SURVEY.md §2.8
    * "windows: none"); this is the bounded-state variant the 100 TB
    * design runs instead — state is evicted once the watermark passes a
    * window's end, so state size is O(active windows), not O(keys seen
    * ever). */
  def windowedCounts(
      df: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, slideDur: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Trending terms over event-time windows: tokenize + explode into
    * [[windowedCounts]] (tumbling windows, watermark-bounded state).
    * In append mode a window's counts emit exactly once, when the
    * watermark closes it — so the per-window top-k rank runs
    * downstream as BATCH work on closed windows
    * ([[topKPerWindow]] inside foreachBatch), never as unbounded
    * streaming state. Token explosion happens before the shuffle the
    * windowed groupBy needs anyway; state is (active windows x
    * distinct terms), the corpus-size-independent bound. */
  def trendingTerms(
      docs: DataFrame, tsCol: String, textCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    windowedCounts(
      docs.select(col(tsCol),
        explode(graft.functions.TextFunctions.words(col(textCol))).as("term")),
      tsCol, "term", windowDur, windowDur, watermarkDelay)

  /** Batch top-k companion for [[trendingTerms]]' foreachBatch stage:
    * rank closed windows' terms by (count desc, term) and keep k per
    * window. Partitioned by window — bounded groups, no global sort. */
  def topKPerWindow(closed: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("window")).orderBy(col("n").desc, col("term"))
    closed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Streaming exact dedup: first-seen-wins per key, state bounded by
    * the watermark (`dropDuplicatesWithinWatermark` — duplicates are
    * only tracked while they can still arrive). The streaming face of
    * `graft.dedup.Dedup.exactGroups` for the training-data pipeline. */
  def dedupStream(df: DataFrame, tsCol: String, watermarkDelay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream LEFT OUTER interval join (§2.8's outer
    * face — J1 covers the inner join): each left row pairs with every
    * right row of the same key whose event time falls in
    * [left.ts, left.ts + `within`]; a left row with NO match is
    * emitted once with nulls on the right side — but only after the
    * watermark passes its join window, because until then a match
    * could still arrive. Both sides MUST be watermarked and the time
    * bound MUST appear in the join condition: that pair is what lets
    * Spark evict buffered state instead of holding both streams
    * forever — the unbounded-state trap of a naive outer join at
    * 100 TB/day. Left columns arrive prefixed `l_`, right `r_`, so
    * key/ts names never collide. */
  def intervalLeftJoin(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      watermarkDelay: String, within: String): DataFrame = {
    def pfx(df: DataFrame, p: String): DataFrame =
      df.select(df.columns.toIndexedSeq.map(c => col(c).as(s"$p$c")): _*)
    val l = pfx(left, "l_").withWatermark(s"l_$tsCol", watermarkDelay)
    val r = pfx(right, "r_").withWatermark(s"r_$tsCol", watermarkDelay)
    l.join(r,
      expr(s"l_$keyCol = r_$keyCol AND r_$tsCol >= l_$tsCol " +
        s"AND r_$tsCol <= l_$tsCol + interval $within"),
      "leftOuter")
  }

  /** Consecutive-change suppression via flatMapGroupsWithState (the
    * reference's consumer models only repaint the UI when a station's
    * state actually changes — consumers/models/station.py mutates in
    * place; this is that semantics as a stream operator): a key's row
    * is emitted only when its value differs from the stored state, so
    * an unchanged upsert produces no downstream traffic. Unlike
    * dropDuplicates, a key may re-emit a previously-seen value after an
    * intervening change (A -> B -> A emits three times). Rows carry an
    * explicit monotone ordinal — the per-group iterator order within a
    * micro-batch is not guaranteed, so the batch is sorted by it. */
  def changedOnly[K: Encoder, V: Encoder](
      ds: Dataset[(K, Long, V)]): Dataset[(K, V)] = {
    implicit val tupleEnc: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[V, (K, V)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long, V)], state: GroupState[V]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, V)]
          var current = state.getOption
          rows.toSeq.sortBy(_._2).foreach { case (_, _, v) =>
            if (!current.contains(v)) { out += ((key, v)); current = Some(v) }
          }
          current.foreach(state.update)
          out.iterator
      }
  }

  /** A2 imperative: last-write-wins upsert via mapGroupsWithState —
    * the direct Faust-table counterpart (faust_stream.py:41-46,71).
    * Rows carry an explicit monotone ordinal (offset/event-time): the
    * per-group iterator order WITHIN a micro-batch is not guaranteed by
    * Spark, so "last" must be defined by data, not arrival. Emits the
    * current table row for each key touched in the batch. */
  def upsertLatest[K: Encoder, V: Encoder](
      ds: Dataset[(K, Long, V)]): Dataset[(K, V)] = {
    implicit val stateEnc: Encoder[(Long, V)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[V]])
    implicit val outEnc: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, V), (K, V)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long, V)], state: GroupState[(Long, V)]) =>
          var latest = state.getOption.getOrElse((Long.MinValue, null.asInstanceOf[V]))
          rows.foreach { case (_, ord, v) =>
            if (ord >= latest._1) latest = (ord, v)
          }
          state.update(latest)
          (key, latest._2)
      }
  }

  /** A2 on Spark 4's arbitrary-state v2 API (`transformWithState`):
    * the same last-write-wins upsert as [[upsertLatest]], expressed as
    * a `StatefulProcessor` over a named `ValueState`. What this API
    * adds over `mapGroupsWithState` at scale: RocksDB-backed state with
    * changelog checkpointing, per-state TTL (`TTLConfig`) so abandoned
    * keys expire without custom timeout plumbing, and timers — the
    * state-growth controls a 100 TB keyed table needs. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def upsertLatestTws[K: Encoder, V: Encoder](
      ds: Dataset[(K, Long, V)],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[(K, V)] = {
    implicit val outEnc: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    val stateEnc: Encoder[(Long, V)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[V]])
    val processor = new StatefulProcessor[K, (K, Long, V), (K, V)] {
      @transient private var latest: ValueState[(Long, V)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        latest = getHandle.getValueState[(Long, V)]("latest", stateEnc, ttl)
      override def handleInputRows(
          key: K, rows: Iterator[(K, Long, V)],
          timerValues: TimerValues): Iterator[(K, V)] = {
        var cur =
          if (latest.exists()) latest.get()
          else (Long.MinValue, null.asInstanceOf[V])
        rows.foreach { case (_, ord, v) => if (ord >= cur._1) cur = (ord, v) }
        latest.update(cur)
        Iterator.single((key, cur._2))
      }
    }
    // TTL state requires a processing-time clock; TimeMode.None would
    // reject (and could never expire) a non-NONE TTLConfig
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_._1)
      .transformWithState(processor, timeMode, OutputMode.Update())
  }
}
