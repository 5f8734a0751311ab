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

    // Adapter assumption 0 (r6, VERDICT r5 #8): every gate-query column of
    // every table keeps its TYPE FAMILY. Families, not exact types, so a
    // harmless width change (int32→int64) passes while the kind of drift
    // that breaks query semantics (double→decimal, string→binary,
    // timestamp→string) fails as ONE named line listing every drifted
    // column. Extra columns are tolerated (queries select by name);
    // missing columns are drift.
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    val fractional = Set[DataType](FloatType, DoubleType)
    val str = Set[DataType](StringType)
    // LongType: the raw-nanos legacy encoding events.ts used in r1–r3
    val tstamp = Set[DataType](TimestampType, TimestampNTZType, LongType)
    val expected: Map[String, Map[String, Set[DataType]]] = Map(
      "region" -> Map("r_regionkey" -> integral, "r_name" -> str),
      "nation" -> Map("n_nationkey" -> integral, "n_name" -> str,
        "n_regionkey" -> integral),
      "customer" -> Map("c_custkey" -> integral, "c_name" -> str,
        "c_nationkey" -> integral, "c_acctbal" -> fractional,
        "c_mktsegment" -> str),
      "supplier" -> Map("s_suppkey" -> integral, "s_name" -> str,
        "s_nationkey" -> integral, "s_acctbal" -> fractional),
      "part" -> Map("p_partkey" -> integral, "p_name" -> str,
        "p_brand" -> str, "p_type" -> str, "p_size" -> integral,
        "p_retailprice" -> fractional),
      "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
        "o_orderstatus" -> str, "o_totalprice" -> fractional,
        "o_orderdate" -> tstamp, "o_orderpriority" -> str),
      "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
        "l_suppkey" -> integral, "l_linenumber" -> integral,
        "l_quantity" -> fractional, "l_extendedprice" -> fractional,
        "l_discount" -> fractional, "l_tax" -> fractional,
        "l_returnflag" -> str, "l_linestatus" -> str,
        "l_shipdate" -> tstamp),
      "events" -> Map("event_id" -> integral, "ts" -> tstamp,
        "user_id" -> integral, "event_type" -> str, "value" -> fractional,
        "props" -> str),
      "documents" -> Map("doc_id" -> integral, "text" -> str,
        "lang" -> str, "source" -> str, "n_chars" -> integral),
      "embeddings" -> Map("vec_id" -> integral, "label" -> integral))
    val drift = for {
      (t, cols) <- expected.toSeq.sortBy(_._1)
      sch <- schemas.get(t).toSeq
      (c, fams) <- cols.toSeq.sortBy(_._1)
      problem <- sch.fields.find(_.name == c) match {
        case None => Some(s"$t.$c: MISSING")
        case Some(f) if !fams.contains(f.dataType) =>
          Some(s"$t.$c: ${f.dataType.simpleString} (expected one of " +
            s"${fams.map(_.simpleString).toSeq.sorted.mkString("/")})")
        case _ => None
      }
    } yield problem
    if (drift.nonEmpty) throw new IllegalStateException(
      s"SCHEMA_DRIFT: testdata regeneration changed ${drift.size} column(s) — " +
        drift.mkString("; ") +
        " — update the adapters/pins in graft/tables before trusting any query")

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
