package graft.tables

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom filter index — the point-lookup complement to
  * [[StatsManifest]]'s min/max skipping (the Delta "bloom filter index" /
  * Iceberg parquet-bloom analog, kept in a sidecar the way the stats
  * manifest is).
  *
  * Min/max skipping only helps when the file layout is clustered on the
  * probed column; a 100 TB table has ONE clustering order, and every other
  * high-cardinality column (user_id, order id, document id…) sees min/max
  * ranges that span the whole domain in every file. A per-file Bloom
  * filter answers "might file F contain key k?" regardless of layout, so a
  * point lookup schedules O(1 + fpp·files) scan tasks instead of all of
  * them.
  *
  * Build cost: one extra pass over the just-written immutable snapshot,
  * distributed — each task builds the filters for the files whose rows it
  * holds (`input_file_name` grouping), and only the serialized filters
  * (~1.2 bytes/key at 3% fpp) travel to the driver for the manifest write.
  *
  * Format: one line per file, `path\tcol:kind:b64(bloomBytes)` per indexed
  * column, kind ∈ {l (hashed as long), s (hashed as UTF-8 string)}.
  * Files with no live rows for a column still get an (empty) filter, so
  * lookup pruning stays a superset guarantee; a file missing from the
  * manifest entirely is always kept.
  */
private[tables] object BloomIndex {

  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String) = java.util.Base64.getDecoder.decode(s)

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos); bos.toByteArray
  }

  /** Build per-file Bloom filters over `bloomCols` of `snap` (a freshly
    * written snapshot directory read) and write the sidecar to `out`.
    * Integral columns hash as longs, everything else as strings. */
  def write(snap: DataFrame, bloomCols: Seq[String], fpp: Double,
      fs: FileSystem, out: Path): Unit = {
    val kinds = bloomCols.map { c =>
      c -> (snap.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType => "l"
        case _                                             => "s"
      })
    }
    val proj = snap.select(input_file_name().as("__file") +:
      kinds.map { case (c, k) =>
        if (k == "l") col(c).cast("long").as(c) else col(c).cast("string").as(c)
      }: _*)
    val lines = proj
      .groupByKey(_.getString(0))(Encoders.STRING)
      .mapGroups { (file, rows) =>
        // buffer the (narrow, key-only) rows once: BloomFilter.create needs
        // the item count up front, and a file's keys fit where its sort did
        val buf = rows.toArray
        val entries = kinds.zipWithIndex.map { case ((c, k), i) =>
          val bf = BloomFilter.create(math.max(buf.count(!_.isNullAt(i + 1)), 1L), fpp)
          buf.foreach { r =>
            if (!r.isNullAt(i + 1)) {
              if (k == "l") bf.putLong(r.getLong(i + 1))
              else bf.putString(r.getString(i + 1))
            }
          }
          s"$c:$k:${b64(serialize(bf))}"
        }
        (file +: entries).mkString("\t")
      }(Encoders.STRING)
      .collect()
    val o = fs.create(out, true)
    try o.write(lines.mkString("\n").getBytes("UTF-8")) finally o.close()
  }

  private def filesWhere(lines: Vector[String], column: String,
      mightContain: BloomFilter => Boolean): Vector[String] =
    lines.map(_.split("\t")).collect {
      case parts if {
        val entry = parts.drop(1).find(_.startsWith(s"$column:"))
        // no entry for this column on this file → keep (superset guarantee)
        entry.forall { e =>
          val Array(_, _, blob) = e.split(":", 3)
          mightContain(BloomFilter.readFrom(new ByteArrayInputStream(unb64(blob))))
        }
      } => parts(0)
    }

  /** Files whose Bloom filter for `column` might contain the long key. */
  def filesMightContainLong(lines: Vector[String], column: String, value: Long): Vector[String] =
    filesWhere(lines, column, _.mightContainLong(value))

  /** Files whose Bloom filter for `column` might contain the string key. */
  def filesMightContainString(lines: Vector[String], column: String, value: String): Vector[String] =
    filesWhere(lines, column, _.mightContainString(value))
}
