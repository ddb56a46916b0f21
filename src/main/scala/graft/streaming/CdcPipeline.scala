package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.Materialize

/** Streaming CDC materialization — the reference's deployed data plane
  * (Debezium topic → Hudi upsert, `/root/reference/README.md:22`)
  * re-expressed on Structured Streaming:
  *
  *   readStream (change-event feed)
  *     → event-time watermark (T3 late/replayed data)
  *     → dropDuplicatesWithinWatermark (A4 at-least-once dedup)
  *     → foreachBatch: latest-per-key + upsert into versioned state (A1-A3)
  *
  * The file source stands in for Kafka (no broker in the sandbox —
  * SURVEY.md §7.2); the Kafka variant is the same pipeline with
  * `format("kafka")` + key/value decode and is config-only here.
  *
  * State is a parquet table HASH-BUCKETED on the key into
  * `Config.numBuckets` bucket directories, merged PARTITION-SCOPED: a
  * micro-batch rewrites only the buckets its keys hash into; untouched
  * buckets' files are not read, not rewritten, not even listed. Merge
  * cost is therefore ∝ batch keys × (table size / numBuckets), never
  * ∝ table size — the Hudi upsert shape (`/root/reference/README.md:22`:
  * file groups touched by the batch are the only ones rewritten).
  *
  * Commits are CRASH-SAFE: each batch writes an immutable,
  * NEVER-REUSED `batches/b<id>-<attempt>/__bucket=<n>` directory
  * (existing state is never modified in place — replays and
  * fresh-checkpoint id reuse write elsewhere), then flips tiny
  * per-bucket pointer files with an atomic overwrite-rename; committed
  * state can never be lost mid-commit, only be a mix of per-bucket
  * versions that the idempotent latest-wins replay converges.
  * Every commit also appends a MANIFEST (the full bucket → dir map),
  * giving the store a commit timeline: [[stateAsOf]] reads any commit
  * inside the retention window ([[Config.retainVersions]]) and GC
  * deletes only dirs outside it — which simultaneously keeps the
  * version a concurrent reader resolved just before a flip. This is a
  * minimal per-file-group commit timeline with time travel — the same
  * protocol shape a table format provides at lake scale.
  */
object CdcPipeline {

  final case class Config(
      keyCols: Seq[String] = Seq("key"),
      tsCol: String = "ts",
      orderCols: Seq[String] = Seq("ts_us", "event_id"),
      opCol: String = "op",
      watermarkDelay: String = "10 minutes",
      numBuckets: Int = 32,
      // how many recent COMMITS stay fully readable: every bucket dir
      // referenced by the last `retainVersions` manifests survives GC,
      // giving bounded TIME TRAVEL ([[stateAsOf]]) and the
      // concurrent-reader guard in one policy (≥ 2 keeps the version a
      // reader resolved just before a commit)
      retainVersions: Int = 2)

  /** Deterministic bucket of a row's key — the unit of merge I/O. */
  private[streaming] def bucketOf(cfg: Config): org.apache.spark.sql.Column =
    pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.numBuckets))
      .cast("int")

  /** Optional per-phase wall-clock recorder for [[mergeBatch]] — set
    * only by `graft.CdcMergeBench` to attribute where a commit's fixed
    * cost goes (batch materialization vs merge write vs pointer/
    * manifest/GC filesystem work). None in production: the `timed`
    * wrapper is a nanoTime pair and a None check per PHASE (≤6 per
    * commit), not per row.
    */
  @volatile private[graft] var phaseRecorder
      : Option[(String, Double) => Unit] = None

  private def timed[T](phase: String)(f: => T): T =
    phaseRecorder match {
      case None => f
      case Some(rec) =>
        val t0 = System.nanoTime()
        val r = f
        rec(phase, (System.nanoTime() - t0) / 1e9)
        r
    }

  /** File-backed change-event stream (schema must be supplied: streaming
    * sources cannot infer). `options` passes source tuning through —
    * e.g. `maxFilesPerTrigger` to bound micro-batch size (the file-source
    * analog of Kafka's `maxOffsetsPerTrigger` backpressure knob).
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.options(options).schema(schema).parquet(dir)

  /** A4/T3: watermarked exact-duplicate drop. State for a key expires
    * once the watermark passes, so memory is bounded by delay × rate,
    * not by history length.
    */
  def dedupWithinWatermark(changes: DataFrame, cfg: Config): DataFrame = {
    val cols = (cfg.keyCols ++ cfg.orderCols) :+ cfg.opCol
    changes
      .withWatermark(cfg.tsCol, cfg.watermarkDelay)
      .dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)
  }

  /** Start the pipeline: dedup → per-batch latest-wins merge into
    * `statePath`. AvailableNow processes everything present then stops
    * (test/replay mode); pass `trigger = None` for continuous.
    */
  def start(changes: DataFrame,
            statePath: String,
            checkpointPath: String,
            cfg: Config = Config(),
            availableNow: Boolean = true): StreamingQuery = {
    val deduped = dedupWithinWatermark(changes, cfg)
    val writer = deduped.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch.drop(cfg.tsCol), statePath, cfg, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Guard the bucket layout: `numBuckets` is the modulus every bucket
    * path was derived under — merging with a different value would
    * recompute `bucketOf` under the new modulus while untouched buckets
    * keep the old layout, leaving a key live in two bucket dirs that
    * latest-wins never reconciles. The first commit persists the value
    * in a tiny metadata pointer; every later merge/compact must match.
    */
  private def checkBucketLayout(fs: org.apache.hadoop.fs.FileSystem,
                                statePath: String, cfg: Config): Unit = {
    val meta = new Path(s"$statePath/meta/numBuckets")
    if (fs.exists(meta)) {
      val persisted = graft.sources.PointerFile.read(fs, meta).toInt
      require(persisted == cfg.numBuckets,
        s"state at $statePath was laid out with numBuckets=$persisted; " +
          s"merging with numBuckets=${cfg.numBuckets} would split keys " +
          "across incompatible bucket layouts")
    } else graft.sources.PointerFile.write(fs, meta,
      cfg.numBuckets.toString)
  }

  /** SCHEMA GATE AT THE SINK — [[mergeBatch]] behind the registry's
    * compatibility verdict, the consumer-side mirror of the reference's
    * producer gate (`/root/reference/bin/mskc-connector.sh:444-445`:
    * auto-registration under BACKWARD; acceptance cases
    * `README.md:466-479`). The batch's schema is registered under
    * `subject` BEFORE any write: a compatible evolution (case 1 drop /
    * case 2 nullable add) records a new version and merges; an
    * incompatible one (case 3: NOT NULL add without default) fails fast
    * with the registry's verdict and the state store is untouched —
    * exactly where the reference's produce fails.
    *
    * Driver-side metadata only: one schema compare per micro-batch,
    * nothing per-row, so the gate costs the same at 100 TB as at 100 MB.
    */
  def mergeBatchGated(batch: DataFrame, statePath: String, cfg: Config,
                      batchId: Long, registry: graft.cdc.SchemaRegistry,
                      subject: String): Unit =
    registry.register(subject, batch.schema) match {
      case Left(inc) => throw new IllegalArgumentException(
        s"schema rejected for subject '$subject' " +
          s"(registry verdict, state untouched): " +
          inc.reasons.mkString("; "))
      case Right(_) => mergeBatch(batch, statePath, cfg, batchId)
    }

  /** State-store path of one demultiplexed table (topic names are
    * path-safe after sanitization; dots are kept — they're the
    * server.db.table separators, `/root/reference/README.md:436`).
    */
  def tablePath(basePath: String, topic: String): String =
    s"$basePath/tables/${topic.replaceAll("[^A-Za-z0-9._-]", "_")}"

  /** MULTI-TABLE FAN-OUT — one streaming query materializing EVERY
    * captured table: the mixed feed (one connector, N tables routed
    * topic-per-table, `/root/reference/bin/mskc-connector.sh:406`
    * `database.include.list` + `README.md:436` routing) is demultiplexed
    * INSIDE a single foreachBatch into one bucketed state store per
    * topic. `tables` maps each topic to its payload columns (its
    * schema — tables differ, the mixed stream carries the union with
    * nulls); topics not in the map are ignored, the include-list
    * semantics (F1) the reference applies at capture time.
    *
    * Scale: the micro-batch is persisted once and each table's slice is
    * a partition-local filter+project over it — no shuffle per table,
    * no second pass over the source. The distinct-topic collect is
    * bounded by the table count (connector config size, not data size).
    * Per-table merges then pay only their own touched-bucket I/O, so
    * total merge cost equals the single-table case split N ways.
    * With a `registry`, every table's slice passes the schema gate
    * ([[mergeBatchGated]], subject = topic) before its merge.
    */
  def demuxBatch(batch: DataFrame, basePath: String,
                 tables: Map[String, Seq[String]], cfg: Config,
                 batchId: Long, topicCol: String = "topic",
                 registry: Option[graft.cdc.SchemaRegistry] = None)
      : Unit = {
    if (batch.isEmpty) return
    batch.persist()
    try {
      val present = batch.select(topicCol).distinct()
        .collect().map(_.getString(0))
        .filter(tables.contains).sorted
      present.foreach { t =>
        val slice = batch.filter(col(topicCol) === t)
          .select(tables(t).map(col): _*)
        val path = tablePath(basePath, t)
        registry match {
          case Some(r) => mergeBatchGated(slice, path, cfg, batchId, r, t)
          case None    => mergeBatch(slice, path, cfg, batchId)
        }
      }
    } finally batch.unpersist()
  }

  /** Start the multi-table pipeline: ONE streaming query, watermarked
    * dedup keyed on (topic, key) — keys from different tables may
    * collide, the topic is part of row identity — then per-batch
    * demultiplex into per-table stores ([[demuxBatch]]).
    */
  def startMultiTable(changes: DataFrame,
                      basePath: String,
                      checkpointPath: String,
                      tables: Map[String, Seq[String]],
                      cfg: Config = Config(),
                      topicCol: String = "topic",
                      registry: Option[graft.cdc.SchemaRegistry] = None,
                      availableNow: Boolean = true): StreamingQuery = {
    val streamCfg = cfg.copy(keyCols = topicCol +: cfg.keyCols)
    val deduped = dedupWithinWatermark(changes, streamCfg)
    val writer = deduped.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        demuxBatch(batch.drop(cfg.tsCol), basePath, tables, cfg,
          batchId, topicCol, registry)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One schema-gate rejection surfaced by the evolving pipeline:
    * which producer schema version was refused, in which micro-batch,
    * how many wire rows it carried, and the registry's reasons.
    */
  final case class EvolvingRejection(wireVersion: Int, batchId: Long,
                                     rows: Long, reasons: Seq[String])

  /** LIVE MID-STREAM SCHEMA EVOLUTION — the reference's acceptance
    * cases (`/root/reference/README.md:453-480`) happening to a
    * RUNNING pipeline, not a batch replay: the writer schema changes
    * BETWEEN micro-batches of one streaming query, and each batch
    * passes the registry gate before anything touches state.
    *
    * The wire is the registry-converter shape the reference deploys
    * (`/root/reference/bin/mskc-connector.sh:440-445`): every record
    * carries its payload as binary Avro plus the producer's schema —
    * here a (`schema_version`, `schema_json`) pair per record, the
    * file-feed stand-in for a registry id lookup (Debezium's
    * JsonConverter `schemas.enable=true` embeds the full schema the
    * same way). The streaming SOURCE schema is therefore FIXED —
    * `(key string, value binary, topic string, ts timestamp,
    * event_id long, schema_version int, schema_json string)` — while
    * the DECODED schema evolves freely between micro-batches, which is
    * exactly how a real Kafka+Avro topic evolves under a fixed
    * consumer.
    *
    * Per micro-batch:
    *   1. the distinct (version, schema) pairs — bounded by the number
    *      of schema CHANGES, never data size — register through the
    *      gate in version order: a compatible evolution (case 1 drop /
    *      case 2 nullable add) records a new registry version; an
    *      incompatible one (case 3: NOT NULL add, no default) is
    *      REFUSED;
    *   2. refused versions' raw wire rows divert to
    *      `deadLetterPath/v<version>` with a loud, queryable rejection
    *      record (`_REJECTIONS/v<version>-b<batch>.json`: subject,
    *      reasons, row count) and `onRejection` fires — THE STREAM
    *      KEEPS RUNNING, matching the reference where case 3 fails the
    *      producer while the pipeline survives;
    *   3. accepted versions decode with their OWN writer schema,
    *      normalize into the merged read-schema (dropped columns null
    *      on new rows, added columns null on old state — Debezium
    *      missing-field semantics), and merge latest-wins through the
    *      standard crash-safe commit ([[mergeBatch]]).
    *
    * Gate decisions are memoized per wire version (driver map, one
    * entry per schema change); after a crash-restart the map rebuilds
    * deterministically — re-registration is content-idempotent and a
    * bad schema re-rejects identically. Dead-letter writes are
    * at-least-once under replay (append mode), the standard poison-
    * quarantine contract.
    */
  def startEvolvingAvro(wire: DataFrame,
                        statePath: String,
                        checkpointPath: String,
                        registry: graft.cdc.SchemaRegistry,
                        subject: String,
                        deadLetterPath: String,
                        cfg: Config = Config(),
                        availableNow: Boolean = true,
                        onRejection: EvolvingRejection => Unit = _ => ())
      : StreamingQuery = {
    // wire-level exactly-once: record identity is (key, event_id) —
    // the Kafka offset analog — deduped within the event-time watermark
    val deduped = wire
      .withWatermark(cfg.tsCol, cfg.watermarkDelay)
      .dropDuplicatesWithinWatermark("key", "event_id")
    val decisions = scala.collection.concurrent.TrieMap
      .empty[Int, Either[Seq[String], StructType]]
    val writer = deduped.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        evolvingMergeBatch(batch.drop(cfg.tsCol), statePath,
          deadLetterPath, registry, subject, cfg, batchId, decisions,
          onRejection)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One micro-batch of [[startEvolvingAvro]]: gate → divert → decode →
    * merge. Public for batch-mode replays and the driver-verified query
    * entry; `decisions` memoizes gate verdicts across batches.
    */
  def evolvingMergeBatch(batch: DataFrame, statePath: String,
                         deadLetterPath: String,
                         registry: graft.cdc.SchemaRegistry,
                         subject: String, cfg: Config, batchId: Long,
                         decisions: scala.collection.concurrent.Map[
                           Int, Either[Seq[String], StructType]],
                         onRejection: EvolvingRejection => Unit = _ => ())
      : Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    batch.persist()
    try {
      // distinct schema pairs: bounded by schema CHANGES (producer
      // deploys), not rows — driver-side by design, like demuxBatch's
      // topic collect
      val present = batch.select("schema_version", "schema_json")
        .distinct().collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
      present.foreach { case (v, json) =>
        if (!decisions.contains(v)) {
          val schema = org.apache.spark.sql.types.DataType.fromJson(json)
            .asInstanceOf[StructType]
          decisions(v) = registry.register(subject, schema) match {
            case Right(_)  => Right(schema)
            case Left(inc) => Left(inc.reasons)
          }
        }
      }
      val fs = new Path(deadLetterPath).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val rejected = present.collect {
        case (v, _) if decisions(v).isLeft => v
      }
      rejected.foreach { v =>
        val slice = batch.filter(col("schema_version") === v)
        // raw wire rows, replayable once the producer ships a fix
        slice.write.mode("append").parquet(s"$deadLetterPath/v$v")
        val n = slice.count()
        val reasons = decisions(v).swap.getOrElse(Nil)
        val esc = reasons.map(r =>
          "\"" + r.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        graft.sources.PointerFile.write(fs,
          new Path(s"$deadLetterPath/_REJECTIONS/v$v-b$batchId.json"),
          s"""{"subject":"$subject","wire_version":$v,""" +
            s""""batch_id":$batchId,"rows":$n,""" +
            s""""reasons":[${esc.mkString(",")}]}""")
        onRejection(EvolvingRejection(v, batchId, n, reasons))
      }
      val accepted = present.collect {
        case (v, _) if decisions(v).isRight => v
      }
      if (accepted.nonEmpty) {
        // each version decodes with ITS writer schema (keyed by WIRE
        // version — registry indices can drift from wire numbering once
        // a version is refused), then the frames normalize into the
        // merged read-schema before one latest-wins merge
        val frames = accepted.map { v =>
          graft.cdc.EnvelopeCodec.decodeAvro(
            batch.filter(col("schema_version") === v),
            decisions(v).toOption.get,
            passthrough = Seq("event_id"))
            .withColumn("schema_version", lit(v))
        }
        val decoded =
          graft.cdc.SchemaEvolution.normalizeHistory(frames.toSeq)
        val flat = decoded.select(col("key"), col("event_id"),
          col("ts_us"), col("op"), col("schema_version"), col("after.*"))
        mergeBatch(flat, statePath, cfg, batchId)
      }
    } finally { batch.unpersist(); () }
  }

  /** One micro-batch, partition-scoped: reduce the batch to
    * latest-per-key, read ONLY the state buckets the batch's keys hash
    * into (pure path selection), merge LATEST-WINS BY EVENT TIME, and
    * commit ONLY those buckets (immutable batch dir + pointer flips).
    *
    * The merge is `latest(state ∪ batch)` per key — not a blind
    * replace — so it converges under ANY replay order: re-delivering an
    * old batch after a newer one is a no-op (the state row out-orders
    * it). Tombstones are RETAINED in state (op = d rows) so a delete
    * also cannot be resurrected by an older replayed upsert; external
    * readers get live rows via [[currentState]]'s filter. (At lake
    * scale a compaction pass drops tombstones older than the replay
    * horizon — bounded retention, same as Kafka compacted-topic
    * deletes.)
    */
  def mergeBatch(batch: DataFrame, statePath: String, cfg: Config,
                 batchId: Long): Unit = {
    // drift tolerance (below) is for PAYLOAD columns only: losing a
    // key, ordering, or op column must fail loudly here — nulled keys
    // would collapse a whole batch into one row and nulled order
    // columns would silently lose every update to existing state
    val required = cfg.keyCols ++ cfg.orderCols :+ cfg.opCol
    val missing = required.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"batch is missing required CDC columns: ${missing.mkString(", ")}")
    val order = cfg.orderCols.map(col)
    // ONE materialization of the batch's latest-per-key feeds BOTH the
    // touched-bucket collect and the merge union (no double window).
    // cache(), NOT localCheckpoint(): checkpointing ran a THIRD Spark
    // job per commit that wrote every partition of the batch to local
    // disk before any real work — measured 0.49 s of the 2.1 s
    // per-commit fixed cost at sf0.1 (BASELINE.md round-10). The cache
    // materializes lazily inside the touched-bucket collect job and is
    // reused by the merge write; foreachBatch batch sources are
    // offset-pinned, so an eviction-forced recompute is deterministic.
    val latest = Materialize.latest(batch, cfg.keyCols, order)
      .withColumn("__bucket", bucketOf(cfg))
      .cache()
    try {
      mergeLatest(latest, statePath, cfg, batchId)
    } finally { latest.unpersist(blocking = false); () }
  }

  private def mergeLatest(latest: DataFrame, statePath: String,
                          cfg: Config, batchId: Long): Unit = {
    val spark = latest.sparkSession
    val order = cfg.orderCols.map(col)
    // touched-bucket list: ≤ numBuckets ints, driver-side by design.
    // This collect doubles as the empty-batch probe: the pre-r10 code
    // paid a SEPARATE batch.isEmpty job on every commit before doing
    // anything — folding it here saves one scheduler round trip per
    // commit on the path that matters (non-empty batches), and an
    // empty batch still costs exactly one cheap job.
    val touched = timed("touched_collect")(
      latest.select("__bucket").distinct()
        .collect().map(_.getInt(0)).sorted)
    if (touched.isEmpty) return
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    checkBucketLayout(fs, statePath, cfg)
    val ptrs = readPointers(fs, statePath)
    val statePaths = touched.flatMap(b =>
      ptrs.get(b).map(v => bucketPath(statePath, v, b)))
    // the store's persisted union schema, read ONCE per commit (it
    // also feeds the grow-only persist below — r14 re-read it there,
    // one extra FS round trip per commit)
    val metaSchema = readMetaSchema(fs, statePath)
    // Pre-r14 migration fallback (ADVICE r14): no meta/schema yet —
    // run the one-time footer merge over ALL pointed bucket dirs, not
    // just the touched ones: a drifted column living only in untouched
    // buckets would otherwise be missing from the union this commit
    // persists, and later merges of those buckets under the too-narrow
    // explicit schema would silently null-and-drop it. One distributed
    // footer pass, paid exactly once per store lifetime (the persist
    // below upgrades the store).
    val inferredSchema: Option[StructType] =
      if (metaSchema.nonEmpty || ptrs.isEmpty) None
      else {
        val allPaths = ptrs.toSeq.sortBy(_._1).map { case (b, v) =>
          bucketPath(statePath, v, b)
        }
        Some(spark.read.option("mergeSchema", "true")
          .parquet(allPaths: _*).schema)
      }
    val merged: DataFrame =
      if (statePaths.nonEmpty) {
        // state's bucket is recomputed from the key (deterministic) —
        // files never store it; I/O scoping is pure path selection.
        // Pointed-at bucket dirs can span batches written under
        // DIFFERENT schemas after a drift; the running union schema is
        // persisted in meta/schema at every commit (r14), so the read
        // is explicit-schema — files missing a drifted column null it,
        // exactly the footer-merge union, WITHOUT the per-commit
        // distributed footer-inference job mergeSchema ran (at lake
        // scale that job re-reads every live state footer per commit —
        // a metadata storm the commit log exists to avoid, guide §6).
        // Pre-r14 stores (no meta/schema yet) use the store-wide
        // inferred union above; this commit then persists it.
        val state = (metaSchema.orElse(inferredSchema) match {
          case Some(sch) => spark.read.schema(sch)
          case None => spark.read.option("mergeSchema", "true")
        }).parquet(statePaths.toSeq: _*)
          .withColumn("__bucket", bucketOf(cfg))
        // allowMissingColumns = SCHEMA DRIFT TOLERANCE: a batch that
        // ADDS a column keeps it (state rows read null until touched,
        // Debezium's missing-field semantics); a batch that DROPS one
        // nulls it on its own rows instead of failing the merge.
        Materialize.latest(
          state.unionByName(latest, allowMissingColumns = true),
          cfg.keyCols, order)
      } else latest
    // COMMIT PROTOCOL (crash-safe, single-writer):
    //  1. write the merged touched buckets to a NEVER-REUSED dir (the
    //     attempt suffix makes replays and fresh-checkpoint id reuse
    //     write elsewhere — live pointers can keep referencing old dirs,
    //     nothing is ever overwritten in place);
    //  2. flip each touched bucket's pointer file (atomic overwrite
    //     rename per bucket). A crash mid-flips leaves every bucket on
    //     a COMMITTED version (some old, some new); replaying the batch
    //     converges because the merge is latest-wins idempotent;
    //  3. GC bucket dirs no pointer references (crash before GC only
    //     leaves orphans, collected by the next merge).
    val outDir = uniqueDir("b", batchId)
    // co-locate each bucket before the partitioned write: without this,
    // every shuffle partition holds rows of every touched bucket and
    // partitionBy fans out up to (partitions × buckets) small files per
    // batch — the classic small-file explosion. One exchange on the
    // write column keeps it to one file group per touched bucket with
    // full-size row groups. The EXPLICIT partition count (= touched
    // buckets, never the session's shuffle.partitions) keeps the write
    // stage at one task per touched bucket — inside a streaming
    // foreachBatch AQE is disabled for stateful queries, so without
    // the count a small batch paid shuffle.partitions near-empty write
    // tasks per commit (pure scheduler overhead at high commit rates).
    timed("merge_write")(
      merged.repartition(touched.length, col("__bucket")).write
        .partitionBy("__bucket")
        .mode("overwrite")
        .parquet(s"$statePath/batches/$outDir"))
    // DETERMINISM GUARD (ADVICE r10): `latest` is cache()d, not
    // checkpointed — an eviction-forced recompute between the
    // touched-bucket collect above and the write is only safe if the
    // input batch is replayable (foreachBatch sources are offset-
    // pinned; mergeBatch is also a public API callers can feed
    // anything). If a nondeterministic recompute emitted rows in
    // buckets ABSENT from `touched`, their pointers would never flip
    // and the rows would be silently lost. One listStatus turns that
    // silent loss into a loud failure BEFORE any pointer moves: the
    // crash leaves only an unreferenced batch dir (GC'd later), state
    // intact — the same fail-stop localCheckpoint gave, without its
    // per-commit write-everything job.
    timed("bucket_guard") {
      val touchedSet = touched.toSet
      val written = fs.listStatus(
          new Path(s"$statePath/batches/$outDir"))
        .map(_.getPath.getName)
        .filter(_.startsWith("__bucket="))
        .map(_.stripPrefix("__bucket=").toInt)
      val stray = written.filterNot(touchedSet)
      require(stray.isEmpty,
        s"non-deterministic batch: write produced bucket(s) " +
          s"${stray.sorted.mkString(",")} outside the touched set " +
          s"${touched.mkString(",")} — the input to mergeBatch must be " +
          "replayable (offset-pinned source or checkpointed DataFrame); " +
          "state is untouched, the orphan batch dir will be GC'd")
    }
    // persist the running union schema BEFORE any pointer moves: a
    // crash in between leaves meta a (harmless) superset — the next
    // read nulls the extra columns, the same allowMissingColumns
    // semantics the merge itself applies. Skipped when unchanged (the
    // no-drift steady state), so it costs one pointer write per DRIFT,
    // not per commit.
    timed("meta_schema") {
      // nullable-normalized: file sources read everything nullable, so
      // equality against the stored schema is stable and the read-side
      // schema never asserts a non-null a drifted file can't honor
      val outSchema = org.apache.spark.sql.types.StructType(
        merged.schema.filterNot(_.name == "__bucket")
          .map(_.copy(nullable = true)))
      // GROW-ONLY (ADVICE r14): when every touched bucket is fresh,
      // merged = latest and outSchema is the batch-only schema — a
      // batch missing a drifted column that lives on unwritten buckets
      // must not SHRINK the stored union (later explicit-schema reads
      // of those buckets would silently null-and-lose the column).
      // Union with the stored schema by name, keeping the stored
      // fields' types; write only when the union gains fields.
      val stored = metaSchema.orElse(inferredSchema.map(s =>
        org.apache.spark.sql.types.StructType(
          s.map(_.copy(nullable = true)))))
      val grown = stored match {
        case Some(old) =>
          val have = old.fieldNames.toSet
          org.apache.spark.sql.types.StructType(
            old.fields ++ outSchema.fields.filterNot(f => have(f.name)))
        case None => outSchema
      }
      // write when the union gained fields — or when no meta/schema
      // file exists yet (fresh store, or the one-time migration: the
      // inferred fallback must PERSIST or every commit re-pays the
      // store-wide footer pass)
      if (metaSchema.isEmpty || !stored.contains(grown))
        graft.sources.PointerFile.write(fs,
          new Path(s"$statePath/meta/schema"), grown.json)
    }
    timed("ptr_flips")(
      touched.foreach(b => writePointer(fs, statePath, b, outDir)))
    timed("manifest")(
      writeManifest(fs, statePath, batchId,
        ptrs ++ touched.map(_ -> outDir)))
    timed("gc")(
      gcUnreferenced(fs, statePath, cfg.retainVersions))
  }

  /** Read the current materialized state (live rows only — retained
    * tombstones are internal merge state), if any batch has committed.
    */
  def currentState(spark: SparkSession, statePath: String,
                   opCol: String = "op"): Option[DataFrame] = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ptrs = readPointers(fs, statePath)
    if (ptrs.isEmpty) None
    else {
      val paths = ptrs.toSeq.sortBy(_._1).map { case (b, v) =>
        bucketPath(statePath, v, b)
      }
      // bucket dirs may span batches with drifted schemas — union them
      val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
      // null-safe: a null op (possible after payload drift or mixed
      // old-schema buckets) is NOT a delete — `=!=` would three-value
      // to NULL and silently hide the row (same trap compact() avoids)
      Some(if (df.columns.contains(opCol))
             df.filter(!(col(opCol) <=> "d"))
           else df)
    }
  }

  /** Compaction: rewrite every live bucket, dropping tombstones whose
    * event time is older than `horizonUs` — the bounded-retention pass
    * the merge protocol assumes (a tombstone only needs to outlive the
    * replay horizon; Kafka compacted-topic delete retention). Uses the
    * SAME commit protocol as [[mergeBatch]] (immutable batch dir +
    * per-bucket pointer flips), so it is crash-safe and can run between
    * any two merges. Live rows and still-needed tombstones are
    * byte-for-byte re-laid-out (small files merge as a side effect).
    */
  def compact(spark: SparkSession, statePath: String, cfg: Config,
              horizonUs: Long, batchId: Long): Unit = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ptrs = readPointers(fs, statePath)
    if (ptrs.isEmpty) return
    checkBucketLayout(fs, statePath, cfg)
    val paths = ptrs.toSeq.sortBy(_._1).map { case (b, v) =>
      bucketPath(statePath, v, b)
    }
    val tsCol = col(cfg.orderCols.head)
    // never-reused dir: a retried compact (same id) or a later merge
    // batch must not overwrite a dir live pointers still reference
    val outDir = uniqueDir("c", batchId)
    // null-safe retention: a tombstone with UNKNOWN event time (null
    // ts) must be kept — a three-valued `op != d || ts >= horizon`
    // would evaluate NULL and silently drop it, re-enabling the
    // resurrection this retention exists to prevent
    val compacted = spark.read.option("mergeSchema", "true")
      .parquet(paths: _*)
      .filter(!(col(cfg.opCol) <=> "d" &&
        coalesce(tsCol < horizonUs, lit(false))))
      .withColumn("__bucket", bucketOf(cfg))
    compacted.write
      .partitionBy("__bucket")
      .mode("overwrite")
      .parquet(s"$statePath/batches/$outDir")
    // a fully-tombstoned-and-expired bucket writes no dir: drop its
    // pointer so readers stop referencing it
    val written = fs.listStatus(
        new Path(s"$statePath/batches/$outDir"))
      .map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toInt).toSet
    ptrs.keys.foreach { b =>
      if (written.contains(b)) writePointer(fs, statePath, b, outDir)
      else fs.delete(new Path(s"$statePath/ptr/$b"), false)
    }
    writeManifest(fs, statePath, batchId,
      ptrs.keys.filter(written.contains).map(_ -> outDir).toMap)
    gcUnreferenced(fs, statePath, cfg.retainVersions)
  }

  /** COMMIT MANIFESTS — the state store's timeline. Every successful
    * merge/compact appends one manifest: the FULL bucket → dir map as
    * of that commit, under a zero-padded monotonic sequence (single
    * writer, same assumption as the pointer protocol). Manifests are
    * what make [[stateAsOf]] possible and what GC retention is defined
    * over — the same two jobs a lake table format's commit log does.
    */
  /** The store's persisted running-union schema (`meta/schema`,
    * StructType JSON), maintained by every merge commit since r14 —
    * the explicit read schema that replaces per-commit footer-merge
    * inference. Absent on pre-r14 stores (readers fall back to one
    * mergeSchema pass, and the next commit persists the union).
    */
  private def readMetaSchema(fs: org.apache.hadoop.fs.FileSystem,
                             statePath: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val p = new Path(s"$statePath/meta/schema")
    if (!fs.exists(p)) None
    else org.apache.spark.sql.types.DataType
      .fromJson(graft.sources.PointerFile.read(fs, p)) match {
      case st: org.apache.spark.sql.types.StructType => Some(st)
      case _ => None
    }
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            statePath: String, batchId: Long,
                            ptrs: Map[Int, String]): Unit = {
    val dir = new Path(s"$statePath/manifests")
    fs.mkdirs(dir)
    val seq = listManifests(fs, statePath).lastOption
      .map(_._1 + 1).getOrElse(0L)
    val content = (s"batchId=$batchId" +:
      ptrs.toSeq.sortBy(_._1).map { case (b, v) => s"$b $v" })
      .mkString("\n")
    graft.sources.PointerFile.write(fs, new Path(dir, f"$seq%09d"),
      content)
  }

  /** (seq, manifest path), ascending. */
  private def listManifests(fs: org.apache.hadoop.fs.FileSystem,
                            statePath: String): Seq[(Long, Path)] = {
    val dir = new Path(s"$statePath/manifests")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.forall(_.isDigit))
      .map(s => s.getPath.getName.toLong -> s.getPath)
      .sortBy(_._1)
  }

  private def parseManifest(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path): (Long, Map[Int, String]) = {
    val lines = graft.sources.PointerFile.read(fs, p).split("\n")
    val batchId = lines.head.stripPrefix("batchId=").toLong
    val ptrs = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(b, v) = l.split(" ", 2)
      b.toInt -> v
    }.toMap
    (batchId, ptrs)
  }

  /** The commit timeline: (commit sequence, batch id), oldest first. */
  def commits(spark: SparkSession, statePath: String): Seq[(Long, Long)] = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    listManifests(fs, statePath).map { case (seq, p) =>
      seq -> parseManifest(fs, p)._1
    }
  }

  /** TIME TRAVEL: the materialized state as of the commit for
    * `batchId` (its most recent commit, if ids recur). Readable for
    * the last `retainVersions` commits; older versions' bucket dirs
    * are GC'd and the read fails fast with the missing paths rather
    * than silently returning partial state.
    */
  def stateAsOf(spark: SparkSession, statePath: String, batchId: Long,
                opCol: String = "op"): Option[DataFrame] = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hit = listManifests(fs, statePath).reverse
      .map(m => parseManifest(fs, m._2))
      .find(_._1 == batchId)
    require(hit.nonEmpty,
      s"no commit for batchId=$batchId at $statePath " +
        s"(commits: ${commits(spark, statePath).map(_._2).mkString(",")})")
    val ptrs = hit.get._2
    if (ptrs.isEmpty) None
    else {
      val paths = ptrs.toSeq.sortBy(_._1).map { case (b, v) =>
        bucketPath(statePath, v, b)
      }
      val missing = paths.filterNot(p => fs.exists(new Path(p)))
      require(missing.isEmpty,
        s"state version for batchId=$batchId is beyond the retention " +
          s"window (retainVersions) — GC removed: ${missing.mkString(", ")}")
      val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
      Some(if (df.columns.contains(opCol))
             df.filter(!(col(opCol) <=> "d"))
           else df)
    }
  }

  /** STATE DIFF between two commits — CDC on the materialized state:
    * which keys were added, removed, or updated from commit `fromId`
    * to commit `toId`. A row's VERSION is its order columns (latest-
    * wins means any change advances them), so the diff is a full
    * outer join on the key comparing versions — no payload hashing,
    * no column-set assumptions beyond key + order cols. This is what
    * an incremental downstream consumer reads instead of re-scanning
    * state.
    */
  def stateDiff(spark: SparkSession, statePath: String, fromId: Long,
                toId: Long, cfg: Config = Config()): DataFrame = {
    def side(id: Long, tag: String): DataFrame = {
      val df = stateAsOf(spark, statePath, id, cfg.opCol)
        .getOrElse(spark.emptyDataFrame)
      // explicit presence marker: a null ORDER column in a present row
      // must not read as "key absent"
      df.select((cfg.keyCols ++ cfg.orderCols).map(col): _*)
        .toDF(cfg.keyCols ++ cfg.orderCols.map(c => s"${tag}_$c"): _*)
        .withColumn(s"${tag}_present", lit(true))
    }
    val a = side(fromId, "a")
    val b = side(toId, "b")
    val aVer = cfg.orderCols.map(c => col(s"a_$c"))
    val bVer = cfg.orderCols.map(c => col(s"b_$c"))
    a.join(b, cfg.keyCols, "full_outer")
      .withColumn("change",
        when(col("a_present").isNull, "added")
          .when(col("b_present").isNull, "removed")
          .when(aVer.zip(bVer).map { case (x, y) => x <=> y }
            .reduce(_ && _), null)
          .otherwise("updated"))
      .filter(col("change").isNotNull)
      .select((cfg.keyCols.map(col) :+ col("change")) ++
        bVer.zip(cfg.orderCols).map { case (c, n) => c.as(s"to_$n") }: _*)
  }

  /** bucket → batch-dir name, from the tiny per-bucket pointer files. */
  private def readPointers(fs: org.apache.hadoop.fs.FileSystem,
                           statePath: String): Map[Int, String] = {
    val dir = new Path(s"$statePath/ptr")
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq
      .filter(s => !s.getPath.getName.endsWith(".tmp"))
      .map { st =>
        st.getPath.getName.toInt ->
          graft.sources.PointerFile.read(fs, st.getPath)
      }.toMap
  }

  /** Atomic per-bucket pointer flip — the shared
    * [[graft.sources.PointerFile]] primitive (write a unique tmp,
    * ONE OVERWRITE-rename; a delete-then-rename pair would leave a
    * no-pointer window a crash could turn into GC deleting the
    * bucket's only data).
    */
  private def writePointer(fs: org.apache.hadoop.fs.FileSystem,
                           statePath: String, bucket: Int,
                           batchDir: String): Unit =
    graft.sources.PointerFile.write(fs,
      new Path(s"$statePath/ptr/$bucket"), batchDir)

  /** Never-reused output dir name: id + monotonic attempt stamp. */
  private def uniqueDir(prefix: String, batchId: Long): String =
    s"$prefix$batchId-${System.currentTimeMillis()}-${
      java.util.UUID.randomUUID().toString.take(8)}"

  /** The state-layout path of one bucket's current data. */
  private def bucketPath(statePath: String, version: String,
                         bucket: Int): String =
    s"$statePath/batches/$version/__bucket=$bucket"

  /** Write-time millis embedded in a [[uniqueDir]] name (`p<id>-<ms>-
    * <uuid>`); 0 for anything unparseable so unknown dirs sort oldest.
    */
  private def dirMillis(name: String): Long = {
    val parts = name.split("-")
    if (parts.length >= 2)
      try parts(1).toLong catch { case _: NumberFormatException => 0L }
    else 0L
  }

  /** Delete bucket dirs outside the retention window: every
    * (bucket, dir) referenced by the LAST `retain` MANIFESTS — plus
    * current pointers, plus (for states predating manifests) each
    * bucket's most recently superseded version — survives; everything
    * older goes, then-empty batch dirs with it. Retention ≥ 2 also
    * covers the concurrent-reader race ([[currentState]] resolves
    * pointers eagerly, scans lazily — the version a reader resolved
    * just before a commit is still referenced by the previous
    * manifest), the same policy [[graft.sim.Similarity.buildIvfIndex]]
    * hard-codes as keep-2.
    */
  private def gcUnreferenced(fs: org.apache.hadoop.fs.FileSystem,
                             statePath: String, retain: Int): Unit = {
    val ptrs = readPointers(fs, statePath)
    val batchesDir = new Path(s"$statePath/batches")
    if (!fs.exists(batchesDir)) return
    // retained (bucket, dir) references from the last `retain` commits
    val retained: Set[(Int, String)] = listManifests(fs, statePath)
      .takeRight(math.max(retain, 1))
      .flatMap { case (_, p) =>
        parseManifest(fs, p)._2.toSeq.map { case (b, v) => (b, v) }
      }.toSet
    val batchDirs = fs.listStatus(batchesDir)
    // bucket → every (batch dir, sub path) holding a version of it
    val byBucket = scala.collection.mutable.Map
      .empty[Int, List[(String, Path)]]
    batchDirs.foreach { bd =>
      val batchName = bd.getPath.getName
      fs.listStatus(bd.getPath)
        .filter(_.getPath.getName.startsWith("__bucket="))
        .foreach { sub =>
          val b = sub.getPath.getName.stripPrefix("__bucket=").toInt
          byBucket(b) = (batchName, sub.getPath) ::
            byBucket.getOrElse(b, Nil)
        }
    }
    byBucket.foreach { case (b, dirs) =>
      val current = ptrs.get(b)
      val superseded = dirs.filterNot(d => current.contains(d._1))
      // legacy guard for states whose history predates manifests
      val keepPrev =
        if (superseded.isEmpty) None
        else Some(superseded.maxBy(d => (dirMillis(d._1), d._1))._1)
      dirs.foreach { case (name, path) =>
        if (!current.contains(name) && !keepPrev.contains(name) &&
            !retained((b, name)))
          fs.delete(path, true)
      }
    }
    // empty = no bucket dirs remain (NB: "__bucket=" also starts
    // with '_', so a bare underscore test would match data dirs too)
    batchDirs.foreach { bd =>
      if (fs.exists(bd.getPath) && !fs.listStatus(bd.getPath)
          .exists(_.getPath.getName.startsWith("__bucket=")))
        fs.delete(bd.getPath, true)
    }
    // MANIFEST GC (r10 verdict item 5, the one unbounded accretion the
    // small-file audit found): every commit appends one manifest file
    // and nothing ever deleted them — a months-long low-rate stream
    // accretes one per commit forever. Commits older than the keep
    // window are unreadable anyway (their bucket dirs are GC'd above),
    // so their manifests are dead metadata. Keep retain + 1: the last
    // `retain` readable commits PLUS the most recently aged-out one,
    // whose manifest is what lets stateAsOf fail with the precise
    // "beyond the retention window" diagnostic instead of a bare
    // "no commit" (TimeTravelSpec pins that error). Sequence numbering
    // survives: writeManifest derives the next seq from the NEWEST
    // manifest, which is always kept.
    listManifests(fs, statePath)
      .dropRight(math.max(retain, 1) + 1)
      .foreach { case (_, p) => fs.delete(p, false) }
  }
}
