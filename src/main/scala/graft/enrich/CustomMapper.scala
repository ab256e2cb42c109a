package graft.enrich

import graft.core.FieldType
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructField, StructType}

/** M7: the custom per-project mapper surface — the reference lets users
  * register sandboxed JS `mapper(event, params, …)` functions that
  * read/mutate/add fields or drop events
  * (CustomEventMapperHttpService.java:106-384; the `EventProxy`
  * get/set/setOnce contract at 363-384). The JVM here has no sandboxed
  * JS engine, so the registered unit is a Scala function against the
  * same proxy contract — the registration, field-declaration, execution
  * and drop semantics are identical, and a GraalJS-backed
  * implementation would slot behind the same trait.
  *
  * Mutation runs row-wise inside mapPartitions (one proxy per row, no
  * per-row DataFrame API overhead); produced fields must be declared up
  * front, exactly like the reference's `addFieldDependency`.
  */
final class EventProxy private[enrich] (
    val collection: String,
    initial: Map[String, Any]) {
  private[enrich] val fields = scala.collection.mutable.Map(initial.toSeq: _*)
  private[enrich] var dropped = false

  def get(name: String): Any = fields.get(name).orNull
  def set(name: String, value: Any): Unit = fields(name) = value
  /** Write only if currently absent/null (the setOnce contract). */
  def setOnce(name: String, value: Any): Unit =
    if (get(name) == null) fields(name) = value
  /** Remove the event from the batch entirely. */
  def drop(): Unit = dropped = true
}

final case class CustomMapper(
    override val name: String,
    produced: Seq[(String, FieldType)],
    params: Map[String, String],
    fn: (EventProxy, Map[String, String]) => Unit) extends EventMapper {

  override def constantFields: Seq[(String, FieldType)] = produced

  def apply(df: DataFrame): DataFrame = {
    val inNames = df.columns.toSeq
    val outSchema = StructType(df.schema.fields ++
      produced.filterNot(p => inNames.contains(p._1))
        .map(p => StructField(p._1, p._2.spark, nullable = true)))
    val outNames = outSchema.fieldNames.toSeq
    val p = params
    val f = fn
    val rows = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val proxy = new EventProxy("",
          inNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap)
        f(proxy, p)
        if (proxy.dropped) None
        else Some(Row.fromSeq(outNames.map(n => proxy.fields.get(n).orNull)))
      }
    }
    df.sparkSession.createDataFrame(rows, outSchema)
  }
}

/** S7: webhook transform — an arbitrary HTTP body becomes 0..n event
  * JSON lines (the reference's JS `module(params, body, headers)`,
  * WebHookHttpService.java:69-190, where the module may return an
  * array). The produced lines feed [[graft.ingest.JsonIngest]]
  * unchanged. */
object WebhookTransform {
  def apply(bodies: org.apache.spark.rdd.RDD[String],
      fn: String => Seq[String]): org.apache.spark.rdd.RDD[String] =
    bodies.flatMap(fn)
}
