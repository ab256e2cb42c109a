package graft.profiles

import graft.enrich.{EventMapper, MapperPipeline}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** M8: user-property mappers — the reference runs the SAME enrichment
  * mappers (user-agent, referrer, GeoIP) over profile batch operations
  * that it runs over events (`UserPropertyMapper`, applied in
  * UserHttpService.batchUserOperations:135-170; e.g.
  * UserAgentEventMapper.java:47-60), so a `set_properties` carrying a
  * raw `_user_agent` string lands in the profile store already parsed.
  *
  * The op-log payload is a schema-free `Map[String,String]`, while the
  * mappers are typed DataFrame stages — this bridge lifts each mapper's
  * trigger fields out of the map into columns, runs the ordinary
  * [[MapperPipeline]] (same code path as events: broadcast geo join,
  * codegen'd UA/referrer parsing), and folds every produced field back
  * into the map (stringified — profile props are typed at merge, U7).
  * One scan, no shuffle beyond what the mappers themselves do.
  */
object ProfileMappers {

  def enrich(ops: Dataset[ProfileOp], mappers: Seq[EventMapper]): Dataset[ProfileOp] = {
    val spark = ops.sparkSession
    import spark.implicits._
    val triggers = mappers.flatMap(_.dependentFields.keys).distinct

    var df = ops.toDF()
    triggers.foreach { t =>
      df = df.withColumn(t, element_at($"props", t))
    }
    val enriched = MapperPipeline.run(df, mappers)
    // Fold-back set, honoring the dependent-field contract: a dependent
    // field is materialized only for ops whose TRIGGER is present (the
    // reference's addFieldDependency rule — a missing `_user_agent` must
    // not stamp "Other" defaults into every profile). A produced field
    // may itself be a later mapper's trigger (XFF produces `_ip`, geo
    // consumes it); last producer wins on collisions.
    val fieldConds = scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.Column]
    mappers.foreach { m =>
      m.constantFields.foreach { case (f, _) =>
        if (enriched.columns.contains(f)) fieldConds(f) = col(f).cast("string")
      }
      m.dependentFields.foreach { case (t, fs) =>
        fs.foreach { case (f, _) =>
          if (enriched.columns.contains(f) && enriched.columns.contains(t))
            fieldConds(f) = when(col(t).isNotNull, col(f).cast("string"))
        }
      }
    }
    val entries = fieldConds.toSeq.flatMap { case (f, v) => Seq(lit(f), v) }
    val withProps =
      if (entries.isEmpty) enriched
      else enriched
        .withColumn("__enriched", map_filter(map(entries: _*), (_, v) => v.isNotNull))
        // new values win over any same-named existing prop (re-enrichment
        // is idempotent, and map_concat would throw on a duplicate key)
        .withColumn("props", map_concat(
          map_filter($"props", (k, _) => !map_contains_key($"__enriched", k)),
          $"__enriched"))
        .drop("__enriched")
    withProps
      .select($"project", $"id", $"ts", $"seq", $"kind", $"props")
      .as[ProfileOp]
  }
}
