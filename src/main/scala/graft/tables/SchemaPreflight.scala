package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Testdata schema-drift preflight. The driver regenerates
  * /root/testdata between rounds and has already changed a physical type
  * once (events.ts: parquet TIMESTAMP(NANOS) → native timestamp[us],
  * which silently broke 69 gate queries in round 4). Run this at the top
  * of Verify/Bench so a drift surfaces as ONE named line, not dozens of
  * opaque per-query analysis errors.
  */
object SchemaPreflight {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Log every table's footer schema; throw a named error if an adapter
    * assumption no longer holds. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    // same conf Tables.events sets — harmless for non-NANOS files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schemas = tables.flatMap { t =>
      try {
        val sch = spark.read.parquet(s"$sfDir/$t.parquet").schema
        println(s"[preflight] $t: " +
          sch.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
        Some(t -> sch)
      } catch {
        case e: Throwable =>
          println(s"[preflight] $t: UNREADABLE (${e.getMessage})")
          None
      }
    }.toMap

    // Adapter assumption 1: Tables.events handles exactly these ts encodings.
    schemas.get("events").foreach { sch =>
      val ts = sch("ts").dataType
      val ok = ts == LongType || ts == TimestampNTZType || ts.isInstanceOf[TimestampType]
      if (!ok) throw new IllegalStateException(
        s"SCHEMA_DRIFT: events.ts is ${ts.simpleString}; Tables.events/eventsSince " +
          "adapt only long (raw nanos), timestamp_ntz, and timestamp — extend the " +
          "adapter in graft/tables/Tables.scala before trusting any events query")
    }
    // Adapter assumption 2: embeddings vector column stays array<float>.
    schemas.get("embeddings").foreach { sch =>
      sch.fields.find(f => f.dataType.isInstanceOf[ArrayType]).foreach { f =>
        val elem = f.dataType.asInstanceOf[ArrayType].elementType
        if (elem != FloatType && elem != DoubleType)
          throw new IllegalStateException(
            s"SCHEMA_DRIFT: embeddings.${f.name} element is ${elem.simpleString}; " +
              "ANN/similarity operators assume float/double vectors")
      }
    }
    // Adapter assumption 3: documents.text stays string.
    schemas.get("documents").foreach { sch =>
      if (sch.fieldNames.contains("text") && sch("text").dataType != StringType)
        throw new IllegalStateException(
          s"SCHEMA_DRIFT: documents.text is ${sch("text").dataType.simpleString}; " +
            "dedup/text operators assume string")
    }
  }
}
