package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction over the embedding
  * column — the Johnson–Lindenstrauss prep step a vector pipeline runs
  * before clustering / ANN when the native dimension is too wide:
  * distances are approximately preserved at a fraction of the memory
  * and compute. Companion to [[SimilarityQueries]]'s sign-only LSH
  * (same sparse ternary Achlioptas matrix family, different seed — the
  * projection keeps magnitudes where the signature keeps only signs)
  * and to sim7/sim9's quantizers (which shrink precision; this shrinks
  * dimension — real pipelines compose the two).
  *
  * Engine parity: each reduced component is a fixed left-to-right
  * chain of `+`/`-` over cast elements times one exact-binary scale
  * constant — IEEE-deterministic and spelled identically in the SQL
  * twin, generated from the SAME seeded matrix. No sums cross rows, so
  * no decimal accumulator is needed anywhere.
  *
  * Scale posture (100 TB): emb1 is pure scan-side projection — zero
  * shuffles, zero joins, whole-stage codegen over the element chains;
  * at width where the Column tree gets hot, the
  * [[graft.functions.HyperplaneSignature]] native-expression pattern
  * applies unchanged. emb2's distortion audit self-joins only the
  * [[AuditVecs]] sampled vectors (broadcast both sides, 28 pairs).
  */
object ProjectionQueries {

  private val Dims = 64

  /** Reduced dimension: 16 — the 4× shrink a 64-d toy corpus tolerates
    * with JL distortion well inside the emb2-audited envelope. */
  val OutDims = 16

  /** Sparse ternary JL matrix (Achlioptas 2003): entries ±1 with
    * probability 1/6 each (else 0), scaled by √3 to keep the projection
    * an isometry in expectation; the √(1/OutDims) factor folds into the
    * same constant. Seed 7 — NOT 42, so the projection is independent
    * of sim2's hash planes. */
  private val (plusIdx, minusIdx): (Vector[Vector[Int]], Vector[Vector[Int]]) = {
    val rng = new scala.util.Random(7)
    val rows = Vector.tabulate(OutDims) { _ =>
      val signs = Vector.tabulate(Dims)(_ => rng.nextInt(6))
      (signs.zipWithIndex.collect { case (0, i) => i },
        signs.zipWithIndex.collect { case (1, i) => i })
    }
    (rows.map(_._1), rows.map(_._2))
  }

  /** √(3/OutDims). 3/16 = 0.1875 is exact binary, so both engines take
    * the IEEE sqrt of the identical value. */
  private val ScaleSql = s"sqrt(3.0 / $OutDims)"
  private val scaleLit = lit(math.sqrt(3.0 / OutDims))

  /** Component j of the projection: scale · (Σ plus − Σ minus), the
    * fixed-association Column fold. */
  private def component(emb: Column, j: Int): Column = {
    val plus = plusIdx(j).map(i => emb.getItem(i).cast("double"))
    val minus = minusIdx(j).map(i => emb.getItem(i).cast("double"))
    val p = plus.reduceOption(_ + _).getOrElse(lit(0.0))
    val m = minus.reduceOption(_ + _).getOrElse(lit(0.0))
    scaleLit * (p - m)
  }

  /** The reduced vector as array<double>. */
  def reduced(emb: Column): Column =
    array((0 until OutDims).map(component(emb, _)): _*)

  private def sqlComponent(e: String, j: Int): String = {
    val plus = plusIdx(j).map(i => s"CAST($e[${i + 1}] AS DOUBLE)")
    val minus = minusIdx(j).map(i => s"CAST($e[${i + 1}] AS DOUBLE)")
    val p = if (plus.isEmpty) "0.0" else plus.mkString(" + ")
    val m = if (minus.isEmpty) "0.0" else minus.mkString(" + ")
    s"$ScaleSql * (($p) - ($m))"
  }

  private def sqlReduced(e: String): String =
    (0 until OutDims).map(sqlComponent(e, _)).mkString("[", ", ", "]")

  /** EMB1: project every embedding to [[OutDims]] dimensions — one
    * scan, no shuffle. The registered row emits one double column per
    * component (`r00`..`r15`) rather than the raw array: the driver's
    * comparator cannot hash array cells, and the per-component layout
    * verifies every value exactly where a digest would only verify its
    * own formatting. [[reduced]] (array<double>) stays the
    * programmatic API. */
  def emb1RandProjection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comps = (0 until OutDims).map(j =>
      component($"embedding", j).as(f"r$j%02d"))
    Tables(spark, dir, "embeddings")
      .select($"vec_id" +: comps: _*)
  }

  val emb1Sql: String = {
    val comps = (0 until OutDims)
      .map(j => f"${sqlComponent("embedding", j)} AS r$j%02d")
      .mkString(",\n  ")
    s"""SELECT vec_id,
       |  $comps
       |FROM embeddings""".stripMargin
  }

  /** Vectors sampled into the distortion audit (the ai2 convention:
    * the first ids double as the fixed probe set). */
  val AuditVecs = 8

  /** EMB2: the JL distortion audit — for every pair of the first
    * [[AuditVecs]] vectors, the original and reduced squared L2
    * distances and their ratio. The operational reading: ratios
    * drifting far from 1 mean [[OutDims]] is too small for the
    * corpus's intrinsic dimension — raise it before clustering on the
    * reduced space. Both distances fold left-to-right in array order
    * (the [[SimilarityQueries.dotExpr]] parity argument), so the ratio
    * is bit-identical across engines. Broadcast self-join of an
    * [[AuditVecs]]-row frame — nothing corpus-sized moves. */
  def emb2JlDistortion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sample = Tables(spark, dir, "embeddings")
      .filter($"vec_id" < AuditVecs)
      .select($"vec_id", $"embedding", reduced($"embedding").as("red"))
    val a = sample.select($"vec_id".as("id_a"), $"embedding".as("ea"),
      $"red".as("ra"))
    val b = sample.select($"vec_id".as("id_b"), $"embedding".as("eb"),
      $"red".as("rb"))
    broadcast(a).crossJoin(broadcast(b))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        expr("""aggregate(zip_with(ea, eb,
          | (p, q) -> (CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) *
          |   (CAST(p AS DOUBLE) - CAST(q AS DOUBLE))),
          | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
          .as("d2_orig"),
        expr("""aggregate(zip_with(ra, rb,
          | (p, q) -> (p - q) * (p - q)),
          | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
          .as("d2_reduced"))
      .withColumn("ratio", $"d2_reduced" / $"d2_orig")
  }

  private def sqlSqDist(a: String, b: String, cast: Boolean): String = {
    val (p, q) =
      if (cast) (s"CAST($a[i] AS DOUBLE)", s"CAST($b[i] AS DOUBLE)")
      else (s"$a[i]", s"$b[i]")
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1),
       |    i -> ($p - $q) * ($p - $q))),
       |  (acc, v) -> acc + v)""".stripMargin
  }

  val emb2Sql: String =
    s"""WITH s AS (
       |  SELECT vec_id, embedding, ${sqlReduced("embedding")} AS red
       |  FROM embeddings WHERE vec_id < $AuditVecs)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${sqlSqDist("a.embedding", "b.embedding", cast = true)} AS d2_orig,
       |  ${sqlSqDist("a.red", "b.red", cast = false)} AS d2_reduced,
       |  ${sqlSqDist("a.red", "b.red", cast = false)} /
       |    ${sqlSqDist("a.embedding", "b.embedding", cast = true)} AS ratio
       |FROM s a CROSS JOIN s b WHERE a.vec_id < b.vec_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "emb1_rand_projection" -> QueryDef.of(emb1Sql)(emb1RandProjection),
    "emb2_jl_distortion" -> QueryDef.of(emb2Sql)(emb2JlDistortion)
  )
}
