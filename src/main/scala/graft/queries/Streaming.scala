package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming coverage (SURVEY.md §2.9 — absent in the reference;
  * capability supplied by Spark). The events table is replayed as a file
  * stream, aggregated with a 1-hour event-time window, and drained into a
  * memory sink synchronously, so the result is deterministic and the DuckDB
  * batch oracle can check it exactly.
  */
object Streaming {

  // lazy: statefulQueries is declared later in the file
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    statefulQueries ++ slidingQueries ++ Map(
    "s_stream_hourly" -> { (s, dir) =>
      val name = "graft_stream_hourly"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      // stream THROUGH the graft format: native readStream.format("graft")
      // (GraftMicroBatchStream), not a parquet staging path
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      val stream = s.readStream.format("graft").schema(staticSchema).load(gdir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name).orderBy(col("hour"), col("event_type"))
    },

    "s_stream_quality" -> { (s, dir) =>
      // streaming corpus-quality monitor over the DOCUMENTS stream (the
      // events table covered windows/state; this covers the text-pipeline
      // stream shape): per-lang doc counts, char volume, and a rolling
      // quality proxy (mean word length in exact decimal) computed as the
      // corpus lands — the live ingest dashboards a training pipeline
      // watches. Uses maxfilespertrigger to exercise bounded catch-up on a
      // pre-existing directory.
      val name = "graft_stream_quality"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "documents")
      val staticSchema = s.read.format("graft").load(gdir).schema
      val stream = s.readStream.format("graft").schema(staticSchema)
        .option("maxfilespertrigger", "2").load(gdir)
        .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("n_words")).as("words"))
      val q = stream.writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
        .withColumn("chars_per_word",
          col("chars").cast("double") / col("words"))
        .orderBy(col("lang"))
    },

    "s_stream_freq" -> { (s, dir) =>
      // streaming count-min sketch: the frequency-sketch CELLS as the
      // stream's aggregation state. The state story is the point — a
      // naive streaming token counter keeps O(vocab) state that grows
      // with the corpus; the CMS keeps exactly d*w = 1536 cells no
      // matter what flows through, and because cells are plain sums the
      // drained complete-mode output equals the batch sketch
      // bit-for-bit. The probe side (top-10 exact tokens) runs as a
      // batch query over the same table, so the final frame matches
      // t_freq_sketch's oracle exactly: same sketch, fed incrementally.
      val name = "graft_stream_freq"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "documents")
      val staticSchema = s.read.format("graft").load(gdir).schema
      def cmsBucket(jCol: String, wCol: String): String =
        TrainingData.cmsBucket(jCol, wCol) // ONE hash definition, see there
      val stream = s.readStream.format("graft").schema(staticSchema)
        .option("maxfilespertrigger", "2").load(gdir)
        .select(explode(split(col("text"), " ")).as("w"))
        .withColumn("j", explode(expr("sequence(0, 2)")))
        .withColumn("b", expr(cmsBucket("j", "w")))
        .groupBy(col("j"), col("b")).agg(count(lit(1)).as("bc"))
      val q = stream.writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      val cells = s.table(name)
      val counts = s.read.format("graft").load(gdir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      counts.orderBy(col("c").desc, col("w")).limit(10)
        .withColumn("j", explode(expr("sequence(0, 2)")))
        .withColumn("b", expr(cmsBucket("j", "w")))
        .join(cells, Seq("j", "b"))
        .groupBy(col("w"), col("c"))
        .agg(min(col("bc")).as("estimate"))
        .select(col("w"), col("c").as("exact_count"), col("estimate"),
          (col("estimate") - col("c")).as("overestimate"))
        .orderBy(col("w"))
    },

    "s_stream_dedup" -> { (s, dir) =>
      // streaming exactly-once dedup state: the source is deliberately
      // polluted by unioning the event stream with a second stream
      // re-emitting every 10th event; dropDuplicatesWithinWatermark on
      // event_id must restore the exact original row set (whichever copy
      // wins the race, the ROW is identical — output is deterministic).
      // WithinWatermark is the state-BOUNDED form: plain
      // dropDuplicates("event_id") never evicts (the event-time column is
      // not in the key subset), so its state grows one entry per distinct
      // id forever — at 100 TB that query is an OOM; this one expires ids
      // once the watermark passes. The memory sink holds the deduped rows;
      // the final aggregate is batch, so the one stateful operator stays
      // isolated. Oracle: the plain batch aggregate over events.
      val name = "graft_stream_dedup"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      def src = s.readStream.format("graft").schema(staticSchema).load(gdir)
      val merged = src.unionByName(src.filter(col("event_id") % 10 === 0))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
      val q = merged.writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
        .orderBy(col("event_type"))
    },

    "s_stream_join" -> { (s, dir) =>
      // stream-stream INTERVAL join with watermarks — the streaming half of
      // q_range_band_join's attribution shape: each purchase joins the same
      // user's views in the preceding 2 hours, both sides arriving as
      // streams. The time-range condition + watermarks BOUND each side's
      // join state (Spark evicts view rows once p_ts - 2h passes the
      // watermark) — without them a stream-stream join buffers forever,
      // the 100 TB OOM. Inner join: matches emit as soon as both sides
      // arrive, so the drained result equals the batch join exactly; the
      // memory sink holds raw matches and a batch aggregate rolls them up
      // per purchase (one stateful operator per stream, the supported
      // shape).
      val name = "graft_stream_join"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      def src() = s.readStream.format("graft").schema(staticSchema).load(gdir)
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
        .withWatermark("v_ts", "1 hour")
      val purchases = src().filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("p_ts", "1 hour")
      val joined = purchases.join(views, expr(
        """v_user = p_user AND
           v_ts >= p_ts - interval 2 hours AND v_ts <= p_ts"""))
      val q = joined.writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view"))
        .orderBy(col("purchase_id"))
    })

  /** Streaming events row for the stateful sessionization query. */
  case class Ev(user_id: Long, us: Long, event_id: Long)

  /** Per-user running session state: (last event micros, sessions, events). */
  case class SessionState(lastUs: Long, sessions: Long, events: Long)

  val statefulQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_sessions" -> { (s, dir) =>
      // custom streaming state (SURVEY §2.9): per-user sessionization with a
      // 30-minute gap via KeyValueGroupedDataset.flatMapGroupsWithState —
      // the same semantics as the batch q_events_sessions window query, so
      // the DuckDB batch oracle checks it exactly. Events of one user are
      // sorted inside the group function (bounded by per-user event count);
      // the conversion dir is one commit = one micro-batch, so state sees
      // each user once. A live multi-commit stream would additionally need
      // out-of-order merge across batches — the standard caveat for
      // event-time state over file arrival order.
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val name = "graft_stream_sessions"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      val ev = s.readStream.format("graft").schema(staticSchema).load(gdir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .as[Ev]

      def sessionize(user: Long, it: Iterator[Ev],
          st: GroupState[SessionState]): Iterator[(Long, Long, Long)] = {
        val evs = it.toArray.sortBy(e => (e.us, e.event_id))
        var state = st.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
        evs.foreach { e =>
          val newSession =
            state.lastUs == Long.MinValue || e.us - state.lastUs > 1800L * 1000000L
          state = SessionState(e.us,
            state.sessions + (if (newSession) 1L else 0L), state.events + 1L)
        }
        st.update(state)
        Iterator((user, state.sessions, state.events))
      }

      val out = ev.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(sessionize)
        .toDF("user_id", "n_sessions", "n_events")
      val q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name).orderBy(col("user_id"))
    })

  private val slidingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_sliding" -> { (s, dir) =>
      // SLIDING (overlapping) event-time windows — the rolling-rate shape a
      // live ingest dashboard wants (2 h of context refreshed every hour),
      // where tumbling windows would jitter at the boundaries. Each event
      // lands in exactly size/slide = 2 windows; Spark's state is one row
      // per OPEN (window, type) pair — watermark-bounded, independent of
      // history length, so the 100 TB story is the same as tumbling: state
      // O(open windows), throughput one map + windowed agg. complete-mode
      // memory-sink drain keeps the result deterministic for the oracle.
      val name = "graft_stream_sliding"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      val stream = s.readStream.format("graft").schema(staticSchema).load(gdir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total_value"))
      val q = stream.writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name).orderBy(col("win_start"), col("event_type"))
    })

  val oracles: Map[String, String] = Map(
    "s_stream_sliding" ->
      // every event contributes to the two hour-aligned 2 h windows that
      // cover it: starts date_trunc(hour, ts) and one hour earlier
      """SELECT win_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
        |FROM (SELECT date_trunc('hour', ts) - unnest(ARRAY[0, 1]) * INTERVAL 1 HOUR AS win_start,
        |        event_type, value
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "s_stream_join" ->
      // the batch equivalent of the drained stream-stream interval join
      """SELECT p.event_id AS purchase_id, count(*) AS n_views,
        |  min(v.event_id) AS first_view
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 2 HOUR AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_stream_freq" ->
      // identical to t_freq_sketch's oracle BY CONSTRUCTION (shared
      // constant): the streamed cells are sums, incremental fill changes
      // nothing
      TrainingData.cmsOracleSql,
    "s_stream_quality" ->
      """SELECT lang, count(*) AS docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS words,
        |  CAST(sum(n_chars) AS DOUBLE) / sum(len(string_split(text, ' '))) AS chars_per_word
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "s_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "s_stream_sessions" ->
      // identical semantics to the batch q_events_sessions oracle
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts,
        |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
