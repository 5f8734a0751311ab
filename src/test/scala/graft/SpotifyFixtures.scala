package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Regenerated star-schema fixtures mirroring the reference's seed shape
  * (FIXTURES.md; volumes from BASELINE.md): an initial load and an
  * incremental load whose 20 "Premium upgrade" user updates give the SCD2
  * layer a checkable expected outcome. Content is synthetic and
  * deterministic — nothing is copied from the reference SQL.
  */
object SpotifyFixtures {

  case class User(user_id: Int, user_name: String, country: String,
      subscription_type: String, start_date: Date,
      end_date: Option[Date], updated_at: Timestamp)
  case class Artist(artist_id: Int, artist_name: String, genre: String,
      country: String, updated_at: Timestamp)
  case class Track(track_id: Int, track_name: String, artist_id: Int,
      album_name: String, duration_sec: Int,
      release_date: Date, updated_at: Timestamp)
  case class DateRow(date_key: Int, date: Date, day: Int, month: Int,
      year: Int, weekday: String)
  case class StreamEvent(stream_id: Long, user_id: Int, track_id: Int,
      date_key: Int, listen_duration: Int, device_type: String,
      stream_timestamp: Timestamp)

  private val countries = Vector("US", "DE", "BR", "IN", "JP")
  private val genres = Vector("rock", "pop", "jazz", "electronic")
  private val devices = Vector("mobile", "desktop", "tablet")
  private def ts(s: String) = Timestamp.valueOf(s)

  val InitialUpdatedAt: Timestamp = ts("2025-09-01 00:00:00")
  val IncrementalUpdatedAt: Timestamp = ts("2025-10-07 19:49:56")

  def users(n: Int, idFrom: Int, at: Timestamp, sub: String): Seq[User] =
    (idFrom until idFrom + n).map { i =>
      User(i, s"user_$i", countries(i % countries.size), sub,
        Date.valueOf("2024-01-01"), None, at)
    }

  def initialUsers: Seq[User] = users(500, 0, InitialUpdatedAt, "Free")
  /** 50 brand-new users + 20 Premium upgrades of existing ids 0..19. */
  def incrementalUsers: Seq[User] =
    users(50, 500, IncrementalUpdatedAt, "Free") ++
      users(20, 0, IncrementalUpdatedAt, "Premium")

  def initialArtists: Seq[Artist] = (0 until 500).map { i =>
    Artist(i, s"artist_$i", genres(i % genres.size), countries(i % countries.size), InitialUpdatedAt)
  }
  def incrementalArtists: Seq[Artist] = (500 until 550).map { i =>
    Artist(i, s"artist_$i", genres(i % genres.size), countries(i % countries.size), IncrementalUpdatedAt)
  }

  def initialTracks: Seq[Track] = (0 until 500).map { i =>
    Track(i, s"track-$i", i % 500, s"album_${i / 10}", 60 + i % 300,
      Date.valueOf("2024-06-01"), InitialUpdatedAt)
  }
  def incrementalTracks: Seq[Track] = (500 until 550).map { i =>
    Track(i, s"track-$i", i % 500, s"album_${i / 10}", 60 + i % 300,
      Date.valueOf("2025-06-01"), IncrementalUpdatedAt)
  }

  def dates: Seq[DateRow] = (0 until 365).map { i =>
    val d = java.time.LocalDate.of(2024, 10, 7).plusDays(i.toLong)
    DateRow(i, Date.valueOf(d), d.getDayOfMonth, d.getMonthValue, d.getYear,
      d.getDayOfWeek.toString)
  }

  def initialStreams: Seq[StreamEvent] = (0 until 1000).map { i =>
    StreamEvent(i.toLong, i % 500, (i * 7) % 500, i % 365, 30 + i % 270,
      devices(i % devices.size), ts("2025-09-15 12:00:00"))
  }
  /** 300 new facts, 100 of them re-sends of existing stream_ids (SCD1
    * last-write-wins must not duplicate them). */
  def incrementalStreams: Seq[StreamEvent] =
    (1000 until 1200).map { i =>
      StreamEvent(i.toLong, i % 550, (i * 7) % 550, i % 365, 30 + i % 270,
        devices(i % devices.size), IncrementalUpdatedAt)
    } ++ (0 until 100).map { i =>
      StreamEvent(i.toLong, i % 500, (i * 7) % 500, i % 365, 999,
        devices(i % devices.size), IncrementalUpdatedAt)
    }

  def write(spark: SparkSession, dir: String, incremental: Boolean): Unit = {
    import spark.implicits._
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    val inc = incremental
    w((if (inc) initialUsers ++ incrementalUsers else initialUsers).toDF(), "DimUser")
    w((if (inc) initialArtists ++ incrementalArtists else initialArtists).toDF(), "DimArtist")
    w((if (inc) initialTracks ++ incrementalTracks else initialTracks).toDF(), "DimTrack")
    w(dates.toDF(), "DimDate")
    w((if (inc) initialStreams ++ incrementalStreams else initialStreams).toDF(), "FactStream")
  }
}
