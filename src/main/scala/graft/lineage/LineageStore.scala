package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained lineage graph.
  *
  * The reference parses one SQL string per HTTP call and forgets it
  * (`ParseController.java:18-28` — stateless request/response). A
  * lineage service for a real warehouse accumulates edges run over
  * run: every ETL deploy re-parses its statements, most runs touch a
  * SUBSET of the statement population, and consumers ask for (a) the
  * CURRENT graph and (b) WHAT CHANGED between two parser/pipeline
  * versions. At warehouse scale the edge set is itself big data
  * (10^4 statements × 10^2 edges × years of runs), so the store is a
  * run-partitioned parquet layout, not a driver-side map:
  *
  *  - **append** writes one run's edges under `run_id=<n>/` via
  *    `partitionBy` — runs are immutable, appends never rewrite
  *    history, and any per-run read is partition-PRUNED (the scan
  *    touches one directory regardless of store size).
  *  - **snapshot** is latest-wins per STATEMENT: a run that re-parsed
  *    statements {1,2} supersedes only those statements' edges. The
  *    stmt→max(run_id) map is tiny (one row per statement, never per
  *    edge), so the resolving join BROADCASTS — the full edge scan is
  *    the only large side and it flows through map-side.
  *  - **diff** compares two runs over the newer run's statement scope
  *    (a partial re-parse must not report the statements it didn't
  *    touch as "removed"). Lineage is a SET of edges keyed by the
  *    whole row — q192's `rowDiff` keys on (stmt,cols,names) and
  *    compares `conditions`, which breaks when control-dependency
  *    mode legitimately emits a value edge and its `CTRL:` twin under
  *    the same key — so the diff is set algebra (`except` both ways),
  *    each side partition-pruned to one run.
  */
object LineageStore {

  /** Edge columns, in [[LineageEdge]] (contract v1) order. */
  private val edgeCols =
    Seq("stmt", "operation", "table_name", "col_name", "to_name",
      "from_name", "conditions")

  /** Append one run's edges (any DataFrame carrying the v1 edge
    * columns; extras are dropped). Rejects an already-present run id:
    * runs are immutable facts, and a silent double-append would
    * double every edge in that run's partition. */
  def append(spark: SparkSession, storeDir: String, runId: Long,
             edges: DataFrame): Unit = {
    require(!runs(spark, storeDir).contains(runId),
      s"run $runId already present in $storeDir — runs are immutable")
    checkOrStampVersion(spark, storeDir)
    edges.select(edgeCols.map(col): _*)
      .withColumn("run_id", lit(runId))
      .write.mode("append").partitionBy("run_id").parquet(storeDir)
    // A ZERO-edge run (a DDL-only re-parse) writes no partition files,
    // which would make the run invisible to runs() — the immutability
    // require above would then let a later append REUSE the
    // acknowledged id with different content. Materialize the
    // partition directory explicitly so every accepted run id exists
    // (parquet reads ignore a file-less partition dir; mkdirs is
    // idempotent for the non-empty case).
    val (filesystem, root) = fs(spark, storeDir)
    filesystem.mkdirs(
      new org.apache.hadoop.fs.Path(root, s"run_id=$runId"))
  }

  /** The edge-contract version the store was created under, stamped as
    * `_schema_version` beside the partitions on first append and
    * CHECKED on every later one: a store written by a future contract
    * must fail by name, not decode garbage. (The file name starts with
    * `_` so Spark's parquet reader ignores it.) */
  private def checkOrStampVersion(spark: SparkSession,
                                  storeDir: String): Unit = {
    val (filesystem, root) = fs(spark, storeDir)
    val p = new org.apache.hadoop.fs.Path(root, "_schema_version")
    if (filesystem.exists(p)) {
      val in = filesystem.open(p)
      val v = try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      require(v == LineageEdgeSchema.Version.toString,
        s"store $storeDir was written under edge-contract v$v; " +
          s"this library speaks v${LineageEdgeSchema.Version}")
    } else {
      filesystem.mkdirs(root)
      val out = filesystem.create(p, true)
      try out.write(LineageEdgeSchema.Version.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** The store's filesystem — Hadoop's, not java.io: a deployed store
    * lives on HDFS/S3/GCS exactly like the parquet it holds, so every
    * metadata operation (listing, version stamp, vacuum delete) must
    * go through the same FileSystem abstraction the writes use. */
  private def fs(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Run ids present, from the partition directories (no data read). */
  def runs(spark: SparkSession, storeDir: String): Seq[Long] = {
    val (filesystem, root) = fs(spark, storeDir)
    if (!filesystem.exists(root)) Seq.empty
    else filesystem.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("run_id="))
      .map(_.stripPrefix("run_id=").toLong).sorted
  }

  /** All stored edges with their `run_id` (cast to BIGINT — partition
    * inference would otherwise narrow the directory value to INT). */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .withColumn("run_id", col("run_id").cast("long"))

  /** Current graph: for each statement, the edges of the LATEST run
    * that parsed it. `asOf` time-travels — the graph as it stood when
    * run `asOf` was the newest (later partitions pruned out before the
    * scan, so looking at last year costs last year's size). */
  def snapshot(spark: SparkSession, storeDir: String,
               asOf: Option[Long] = None): DataFrame = {
    val all = asOf match {
      case Some(r) => read(spark, storeDir).filter(col("run_id") <= r)
      case None => read(spark, storeDir)
    }
    val latest = all.groupBy("stmt").agg(max("run_id").as("run_id"))
    all.join(broadcast(latest), Seq("stmt", "run_id"))
      .select((Seq("run_id") ++ edgeCols).map(col): _*)
  }

  /** Runs the snapshot can no longer see: every statement run `r`
    * parsed was re-parsed by a LATER run, so `r`'s partition is dead
    * weight. Computed from the distinct (stmt, run_id) pairs — one
    * row per statement per run, never per edge, so the whole check is
    * metadata-sized even when the store holds years of edges. */
  def supersededRuns(spark: SparkSession, storeDir: String): Seq[Long] = {
    val pairs = read(spark, storeDir)
      .select("stmt", "run_id").distinct()
    val latest = pairs.groupBy("stmt")
      .agg(max("run_id").as("latest_run"))
    // a run survives iff it is still SOME statement's latest
    val live = pairs.join(broadcast(latest),
        pairs("stmt") === latest("stmt") &&
          pairs("run_id") === latest("latest_run"))
      .select(pairs("run_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    runs(spark, storeDir).filterNot(live)
  }

  /** Delete the partitions of fully-superseded runs. The snapshot is
    * provably unchanged (no deleted row can win latest-per-statement),
    * so vacuum bounds store growth under continuous re-parsing without
    * touching history that [[diff]] against a LIVE run still needs.
    * Returns the run ids removed. */
  def vacuum(spark: SparkSession, storeDir: String): Seq[Long] = {
    val dead = supersededRuns(spark, storeDir)
    val (filesystem, root) = fs(spark, storeDir)
    dead.foreach { r =>
      filesystem.delete(
        new org.apache.hadoop.fs.Path(root, s"run_id=$r"), true)
    }
    dead
  }

  /** Edge-set diff `fromRun` → `toRun`, restricted to the statements
    * `toRun` actually re-parsed. Returns full edge rows tagged
    * `change` ∈ {added, removed}; an unchanged edge emits nothing. */
  def diff(spark: SparkSession, storeDir: String, fromRun: Long,
           toRun: Long): DataFrame = {
    val a = read(spark, storeDir).filter(col("run_id") === fromRun)
      .select(edgeCols.map(col): _*)
    val b = read(spark, storeDir).filter(col("run_id") === toRun)
      .select(edgeCols.map(col): _*)
    val scope = b.select("stmt").distinct()
    val aScoped = a.join(broadcast(scope), Seq("stmt"))
    aScoped.exceptAll(b).withColumn("change", lit("removed"))
      .unionAll(b.exceptAll(aScoped).withColumn("change", lit("added")))
  }
}
