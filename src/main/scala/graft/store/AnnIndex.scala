package graft.store

import graft.{QueryDef, Tables}
import graft.analytics.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental IVF approximate-nearest-neighbor index — similarity
  * search as a maintained store, the embedding-space sibling of
  * [[DedupIndex]]. sim4 runs the IVF construction inside every query
  * (re-assigning the whole corpus); at 100 TB the index must PERSIST:
  *
  *  - **centroids** are frozen at bootstrap (the deterministic first-K
  *    seeding sim4's oracle uses) — per-append quantizer drift would
  *    silently invalidate every stored posting. They change only
  *    through [[reseed]], which retrains, reassigns EVERYTHING, and
  *    flips generations atomically ([[ai2IndexHealth]] is the drift
  *    monitor that triggers it);
  *  - **postings** (vec_id, cell, embedding, norm, label) are
  *    append-only: each delta batch is assigned against the BROADCAST
  *    centroid frame (one narrow O(delta) pass) and lands as its own
  *    version directory, PARTITIONED BY cell — appending never rewrites
  *    history, and a query's probe reads only its probed cells' files
  *    (partition pruning: scan IO ≈ probes/K of the index regardless of
  *    corpus size);
  *  - **queries** rank the centroid frame (K rows, driver-local), then
  *    exact-score only the probed cells' postings — the sim4 plan
  *    served from disk instead of recomputed.
  *
  * Versions are numbered contiguously from 1; `_CURRENT` points at the
  * highest valid one and flips atomically ([[VersionedState]] layout).
  * `append` carries an expected-version fence: a replayed micro-batch
  * (at-least-once delivery) targets an already-written version and is
  * skipped — exactly-once postings without a transaction log.
  *
  * Ref: the reference has no vector surface; this is the SURVEY §2
  * "beyond the reference" similarity mandate made operable at scale.
  */
object AnnIndex {

  import SimilarityQueries.{IvfCells, IvfProbes}

  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm",
      sqrt(SimilarityQueries.dot(col("embedding"), col("embedding"))))

  private def centroidsOf(emb: DataFrame): DataFrame =
    withNorm(emb).filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        col("norm").as("cnorm"))

  private def centroidsDirOf(path: String, gen: Long) =
    if (gen <= 1L) s"$path/centroids" else s"$path/centroids_g$gen"

  /** `_GEN` marker content `gen:firstVersion`: generation `gen`'s
    * centroids apply once `_CURRENT` reaches `firstVersion` — the same
    * version fence as `_BASE`, so a crash between marker writes and the
    * pointer flip leaves readers on the previous generation's
    * centroids AND postings, never a mix. */
  private def genInfo(path: String): (Long, Long) =
    VersionedState.readMarker(path, "_GEN")
      .map { s => val Array(g, v) = s.split(':'); (g.toLong, v.toLong) }
      .getOrElse((1L, 1L))

  private def activeGen(path: String): Long = {
    val (g, from) = genInfo(path)
    if (VersionedState.currentVersion(path) >= from) g else g - 1
  }

  /** The ACTIVE generation's centroid directory — what assignment,
    * queries, and audits must read. */
  private def centroidsDir(path: String): String =
    centroidsDirOf(path, activeGen(path))

  /** Assign a batch to cells against the broadcast centroid frame. */
  private def assign(batch: DataFrame, cents: DataFrame): DataFrame = {
    val e = withNorm(batch)
    e.crossJoin(broadcast(cents))
      .withColumn("ccos",
        SimilarityQueries.dot(col("embedding"), col("cvec")) /
          (col("norm") * col("cnorm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), col("ccos")).as("cell"))
      .join(e, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"), col("norm"),
        col("label"))
  }

  /** Bootstrap: freeze centroids from the first batch, write postings
    * v=1. The seed vectors (vec_id < [[IvfCells]]) must be present in
    * the bootstrap batch. */
  def initialize(emb: DataFrame, path: String): Unit = {
    val cents = centroidsOf(emb)
    require(cents.count() == IvfCells,
      s"bootstrap batch must contain the $IvfCells seed vectors")
    cents.write.mode("errorifexists").parquet(centroidsDirOf(path, 1))
    writePostings(assign(emb, cents), path, 1)
  }

  /** Append a delta as version `expected`. Returns false (no-op) if
    * that version already exists — the at-least-once replay fence.
    * `batchId` records the streaming high-water mark in the pointer
    * (-1 for batch-API appends). */
  def append(spark: SparkSession, delta: DataFrame, path: String,
      expected: Long, batchId: Long = -1L): Boolean = {
    val cur = VersionedState.currentVersion(path)
    if (expected <= cur) return false
    require(expected == cur + 1, s"append $expected against current $cur")
    val cents = spark.read.parquet(centroidsDir(path))
    writePostings(assign(delta, cents), path, expected, batchId)
    true
  }

  private def writePostings(p: DataFrame, path: String, v: Long,
      batchId: Long = -1L): Unit = {
    // co-locate each cell before the write (r17, guide §6 small files):
    // without this, every input partition opened a file in every cell
    // dir it touched — up to (partitions × cells) near-empty files per
    // version; one exchange makes it one file set per cell, the same
    // discipline compactPostings and InvertedIndex.writeVersion already
    // apply, and the layout serving probes prune against
    p.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(VersionedState.versionDir(path, v))
    // the version dir is complete before the pointer flip
    VersionedState.writePointer(path, v, batchId)
  }

  /** First version directory still carrying live postings: versions
    * below the `_BASE` marker were folded into it by [[compactPostings]]
    * / [[reseed]] and are superseded. The marker carries
    * `base:previousBase` — a base beyond `_CURRENT` is an in-flight
    * rewrite that never flipped the pointer, so readers fall back to
    * the PREVIOUS base (whose dirs still exist; falling back to 1
    * would point at dirs an earlier compaction already deleted). */
  private def baseVersion(path: String): Long = {
    val cur = VersionedState.currentVersion(path)
    VersionedState.readMarker(path, "_BASE").map { s =>
      val parts = s.split(':')
      val b = parts(0).toLong
      if (b <= cur) b
      else if (parts.length > 1) parts(1).toLong
      else 1L
    }.getOrElse(1L)
  }

  /** All postings up to `_CURRENT` (a union of immutable version dirs
    * from the compaction base — append never rewrote anything). */
  def postings(spark: SparkSession, path: String): DataFrame = {
    val cur = VersionedState.currentVersion(path)
    val dirs = (baseVersion(path) to cur).map(VersionedState.versionDir(path, _))
    // basePath makes the v=N dirs one partitioned layout (v, cell both
    // become partition columns; the probe's cell filter still prunes)
    spark.read.option("basePath", path).parquet(dirs: _*)
      .drop("v")
  }

  /** Consolidate all live postings into ONE version directory — the
    * maintenance job an append-only index needs at scale: every
    * streamed append lands a file set per touched cell, so a long-lived
    * index accumulates thousands of tiny files and probe-time footer
    * reads come to dominate scan cost. Rewrites the union as version
    * `cur+1` with one file per cell, marks it the new `_BASE`, flips
    * the pointer (preserving the streaming batch fence), and deletes
    * the superseded dirs. Crash-safe at every step: the base marker
    * only takes effect once `_CURRENT` reaches it, and a reader that
    * resolved the old pointer still finds its dirs until the final
    * delete (single-maintainer discipline, as with
    * [[VersionedState.compact]]). Appends then continue from `cur+2`. */
  def compactPostings(spark: SparkSession, path: String,
      deferDeletion: Boolean = false): Unit = {
    val cur = VersionedState.currentVersion(path)
    val oldBase = baseVersion(path)
    if (oldBase == cur) return // already one live dir
    val v = cur + 1
    postings(spark, path)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(VersionedState.versionDir(path, v))
    VersionedState.writeMarker(path, "_BASE", s"$v:$oldBase")
    VersionedState.writePointer(path, v, VersionedState.lastBatchId(path))
    // deferDeletion keeps the ENTIRE just-superseded set until the
    // NEXT compaction: a concurrent query resolves the full live dir
    // set [base..cur] and compaction supersedes exactly that set, so
    // keeping any smaller suffix protects nothing. The next cycle
    // removes everything below the old base (the previous leftovers).
    val cutoff = if (deferDeletion) oldBase else v
    val hadoopDir = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopDir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(hadoopDir).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.drop(2).toLong)
      .filter(_ < cutoff)
      .foreach(VersionedState.deleteVersion(path, _))
  }

  /** Re-seed the coarse quantizer from the CURRENT corpus — the action
    * [[ai2IndexHealth]]'s drift signals trigger. Frozen centroids rot
    * as the corpus grows away from the bootstrap sample: occupancy
    * skews (probes stop pruning) and recall sags. Re-seeding runs
    * `iters` Lloyd refinements warm-started from the active centroids
    * (max-cosine assignment — the index's own metric — then per-cell
    * dimension means; empty cells keep their old centroid so K never
    * shrinks), REASSIGNS every posting against the new centroids, and
    * writes the result as one consolidated version behind the `_BASE`
    * and `_GEN` markers. Both markers carry the same version fence, so
    * the old generation keeps serving — old centroids with old
    * postings, never a mix — until the single atomic pointer flip;
    * a crash at any step leaves a consistent index. Appends and
    * queries pick up the new generation automatically ([[assign]] and
    * [[query]] read the ACTIVE generation's centroids). Cost: `iters`+1
    * corpus passes against a broadcast K-row frame plus one
    * cell-partitioned rewrite — the same shape as [[compactPostings]],
    * scheduled off the audit, not per append. */
  def reseed(spark: SparkSession, path: String, iters: Int = 2): Unit = {
    import spark.implicits._
    val cur = VersionedState.currentVersion(path)
    val oldBase = baseVersion(path)
    val gen = activeGen(path)
    val posts = postings(spark, path)
      .select($"vec_id", $"embedding", $"label")
    var cents = spark.read.parquet(centroidsDirOf(path, gen))
    for (_ <- 1 to iters) {
      val assigned = assign(posts, cents).select($"vec_id", $"cell")
      val dims = posts
        .select($"vec_id", posexplode($"embedding").as(Seq("d", "v0")))
        .select($"vec_id", $"d", $"v0".cast("double").as("v"))
      val means = dims.join(assigned, "vec_id")
        .groupBy($"cell", $"d")
        .agg((sum($"v") / count($"v")).as("c"))
        .groupBy($"cell")
        .agg(expr(
          "transform(array_sort(collect_list(struct(d, c))), x -> CAST(x.c AS FLOAT))")
          .as("mvec"))
      // empty cells keep their old centroid: K is part of the contract
      cents = cents.join(means, cents("cid") === means("cell"), "left")
        .select(cents("cid"),
          coalesce($"mvec", cents("cvec")).as("cvec"))
        .withColumn("cnorm", sqrt(SimilarityQueries.dot($"cvec", $"cvec")))
    }
    val newGen = gen + 1
    val v = cur + 1
    cents.write.mode("errorifexists").parquet(centroidsDirOf(path, newGen))
    val reread = spark.read.parquet(centroidsDirOf(path, newGen))
    assign(posts, reread)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(VersionedState.versionDir(path, v))
    VersionedState.writeMarker(path, "_BASE", s"$v:$oldBase")
    VersionedState.writeMarker(path, "_GEN", s"$newGen:$v")
    VersionedState.writePointer(path, v, VersionedState.lastBatchId(path))
    (oldBase until v).foreach(VersionedState.deleteVersion(path, _))
  }

  /** Top-k by exact cosine within the query's [[IvfProbes]] closest
    * cells — only those cells' partition files are read. */
  def query(spark: SparkSession, path: String, queryVec: DataFrame,
      k: Int = 10, excludeId: Option[Long] = None): DataFrame = {
    val cents = spark.read.parquet(centroidsDir(path))
    val q = withNorm(queryVec)
      .select(col("embedding").as("qv"), col("norm").as("qnorm"))
    val qcells = cents.crossJoin(broadcast(q))
      .withColumn("qcos",
        SimilarityQueries.dot(col("cvec"), col("qv")) /
          (col("cnorm") * col("qnorm")))
      .orderBy(col("qcos").desc, col("cid"))
      .limit(IvfProbes)
      .select(col("cid")).collect().map(_.getLong(0))
    val probed = postings(spark, path)
      .filter(col("cell").isin(qcells: _*))
    excludeId.fold(probed)(id => probed.filter(col("vec_id") =!= id))
      .crossJoin(broadcast(q))
      .withColumn("cos",
        SimilarityQueries.dot(col("embedding"), col("qv")) /
          (col("norm") * col("qnorm")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cell"), col("cos"))
  }

  /** One micro-batch of [[maintain]], fenced on the PERSISTED
    * high-water batch id (recorded with every pointer flip): a replayed
    * batch (at-least-once delivery after crash recovery) is at or below
    * the high-water mark and skipped — exactly-once postings. The
    * version number is always `currentVersion + 1`, never derived from
    * the batch id, so EMPTY micro-batches (routine: any trigger with no
    * new data, and batches dropped on recovery) leave no version gap —
    * they only advance the recorded batch id via a pointer-only flip.
    * The index must be [[initialize]]d (bootstrap = v1) before the
    * stream starts. */
  def maintainBatch(delta: DataFrame, path: String, batchId: Long): Unit = {
    if (batchId > VersionedState.lastBatchId(path)) {
      if (delta.isEmpty) {
        VersionedState.writePointer(path,
          VersionedState.currentVersion(path), batchId)
      } else {
        append(delta.sparkSession, delta, path,
          VersionedState.currentVersion(path) + 1, batchId)
      }
    }
  }

  /** Maintain the index from an embedding stream — each micro-batch is
    * one [[maintainBatch]] append against the frozen centroids. */
  def maintain(stream: DataFrame, path: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (delta: DataFrame, batchId: Long) => maintainBatch(delta, path, batchId)
    }

  // ---------------- the oracle contract ----------------

  /** AI1: index-served == one-shot. Bootstrap on the first half of the
    * corpus (which contains the seed vectors), append the second half,
    * query vector 0's top-10 — must hash-match sim4's batchless IVF
    * (same centroids by construction, since the seeds live in the
    * bootstrap half), whose SQL twin the oracle runs. Dropping the
    * query vector itself mirrors sim4. */
  def ai1AnnIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
    val tmp = graft.TempDirs.scratchFor("graft-ann-ai1").toString
    val mid = emb.agg((max($"vec_id") / lit(2)).cast("long")).collect()(0).getLong(0)
    initialize(emb.filter($"vec_id" <= mid), tmp)
    append(spark, emb.filter($"vec_id" > mid), tmp, 2L)
    query(spark, tmp, emb.filter($"vec_id" === 0L).select($"embedding"),
      k = 10, excludeId = Some(0L))
  }

  val ai1Sql: String = SimilarityQueries.simIvfSql

  // ---------------- AI2: index health ----------------

  private val HealthQueries = 4
  private val HealthK = 10

  /** AI2: the monitoring loop a frozen-quantizer index NEEDS — the
    * centroids never move after bootstrap, so as the corpus drifts the
    * index silently rots in two measurable ways: cells go skewed (one
    * hot cell absorbs the growth, probes stop pruning) and sampled
    * recall sags (new vectors land far from every frozen centroid).
    * This audit reports both FROM THE STORED INDEX: per-cell posting
    * counts with occupancy shares, and recall@[[HealthK]] of
    * probe-pruned serving vs exact brute force over [[HealthQueries]]
    * sampled queries (the sim8 evaluation pattern, here against the
    * persisted postings). Re-seed when max_share or recall crosses the
    * operator's threshold. Recall divides summed integer hits ONCE, so
    * the number is bit-identical across engines; the oracle recomputes
    * everything from the one-shot IVF assignment, which ai1 proved
    * equal to the index contents. */
  def ai2IndexHealth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
    // one bootstrap build — ai1 already proves append-path equivalence,
    // so the health audit doesn't pay for a second assignment pass
    val tmp = graft.TempDirs.scratchFor("graft-ann-ai2").toString
    initialize(emb, tmp)

    val posts = postings(spark, tmp)
    val cents = spark.read.parquet(centroidsDir(tmp))
    val occ = posts.groupBy($"cell")
      .agg(count(lit(1)).as("n_postings"))
    val q = withNorm(emb.filter($"vec_id" < HealthQueries))
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"norm".as("qnorm"))
    val qcells = cents.crossJoin(broadcast(q))
      .withColumn("qcos",
        SimilarityQueries.dot($"cvec", $"qv") / ($"cnorm" * $"qnorm"))
      .withColumn("r", row_number().over(
        Window.partitionBy($"qid").orderBy($"qcos".desc, $"cid")))
      .filter($"r" <= IvfProbes)
      .select($"qid".as("cqid"), $"cid")
    // ONE scoring pass serves both ranks: exact rank over everything,
    // probed rank as a running count over the same sort order restricted
    // to probed-cell rows — the two windows share one partitioning+sort
    val scored = posts.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos",
        SimilarityQueries.dot($"embedding", $"qv") / ($"norm" * $"qnorm"))
      .join(broadcast(qcells),
        $"qid" === $"cqid" && $"cell" === $"cid", "left")
      .withColumn("in_probe", $"cid".isNotNull)
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    val ranked = scored
      .withColumn("rank", row_number().over(w))
      .withColumn("probe_rank",
        sum(when($"in_probe", 1L).otherwise(0L)).over(w))
      .filter($"rank" <= HealthK ||
        ($"in_probe" && $"probe_rank" <= HealthK))
    val rec = ranked
      .agg(
        sum(when($"rank" <= HealthK, 1L).otherwise(0L)).as("kk"),
        sum(when($"rank" <= HealthK && $"in_probe" &&
          $"probe_rank" <= HealthK, 1L).otherwise(0L)).as("hits"))
      .select(($"hits".cast("double") / $"kk").as("recall_at_10"))
    val tot = occ.agg(sum($"n_postings").as("total"),
      max($"n_postings").as("mxp"))
    occ.crossJoin(broadcast(tot)).crossJoin(broadcast(rec))
      .select($"cell".cast("long").as("cell"), $"n_postings",
        ($"n_postings".cast("double") / $"total").as("occupancy_share"),
        ($"mxp".cast("double") / $"total").as("max_share"),
        $"recall_at_10")
  }

  val ai2Sql: String = {
    import SimilarityQueries.sqlDot
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${sqlDot("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec, norm AS cnorm
       |  FROM e WHERE vec_id < $IvfCells),
       |assigned AS (
       |  SELECT e.vec_id,
       |    arg_max(c.cid, ${sqlDot("e.embedding", "c.cvec")} / (e.norm * c.cnorm)) AS cell
       |  FROM e, cents c GROUP BY e.vec_id),
       |occ AS (SELECT cell, count(*) AS n_postings FROM assigned GROUP BY cell),
       |tot AS (
       |  SELECT CAST(sum(n_postings) AS BIGINT) AS total, max(n_postings) AS mxp
       |  FROM occ),
       |q AS (
       |  SELECT vec_id AS qid, embedding AS qv, norm AS qnorm
       |  FROM e WHERE vec_id < $HealthQueries),
       |qcells AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.qid, c.cid,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${sqlDot("c.cvec", "q.qv")} / (c.cnorm * q.qnorm) DESC, c.cid) AS r
       |    FROM cents c, q)
       |  WHERE r <= $IvfProbes),
       |scored AS (
       |  SELECT q.qid, e.vec_id, a.cell,
       |    ${sqlDot("e.embedding", "q.qv")} / (e.norm * q.qnorm) AS cos
       |  FROM e JOIN assigned a ON e.vec_id = a.vec_id, q
       |  WHERE e.vec_id <> q.qid),
       |exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |    FROM scored)
       |  WHERE rank <= $HealthK),
       |approx AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT s.qid, s.vec_id,
       |      row_number() OVER (PARTITION BY s.qid ORDER BY s.cos DESC, s.vec_id) AS rank
       |    FROM scored s JOIN qcells qc ON s.qid = qc.qid AND s.cell = qc.cid)
       |  WHERE rank <= $HealthK),
       |rec AS (
       |  SELECT CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall_at_10
       |  FROM exact x LEFT JOIN approx a
       |    ON x.qid = a.qid AND x.vec_id = a.vec_id)
       |SELECT o.cell, o.n_postings,
       |  CAST(o.n_postings AS DOUBLE) / t.total AS occupancy_share,
       |  CAST(t.mxp AS DOUBLE) / t.total AS max_share,
       |  r.recall_at_10
       |FROM occ o, tot t, rec r""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "ai1_ann_index" -> QueryDef.of(ai1Sql)(ai1AnnIndex),
    "ai2_index_health" -> QueryDef.of(ai2Sql)(ai2IndexHealth))
}
