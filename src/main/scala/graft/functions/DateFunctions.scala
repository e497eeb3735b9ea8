package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** Lenient date/timestamp parsing — the Spark stand-in for the reference's
  * `dateutil.parser.parse` promotion check (`/root/reference/tabsketchfm/
  * data_prep.py:92-98`): a string column is promoted to DATE iff every
  * non-null value parses. Implemented as a cascade of explicit
  * `DateTimeFormatter`s plus epoch heuristics (SURVEY §1.2, §7 hard part 3).
  */
object DateFunctions {

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive()
      .appendPattern(pattern)
      .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(java.util.Locale.US)

  // Ordered cascade: most specific / least ambiguous first.
  private val formats: Array[DateTimeFormatter] = Array(
    DateTimeFormatter.ISO_LOCAL_DATE_TIME,
    DateTimeFormatter.ISO_OFFSET_DATE_TIME,
    DateTimeFormatter.ISO_INSTANT,
    fmt("yyyy-MM-dd HH:mm:ss.SSSSSS"),
    fmt("yyyy-MM-dd HH:mm:ss.SSS"),
    fmt("yyyy-MM-dd HH:mm:ss"),
    fmt("yyyy-MM-dd HH:mm"),
    fmt("yyyy-MM-dd"),
    fmt("yyyy/MM/dd HH:mm:ss"),
    fmt("yyyy/MM/dd"),
    fmt("MM/dd/yyyy HH:mm:ss"),
    fmt("MM/dd/yyyy HH:mm"),
    fmt("MM/dd/yyyy"),
    fmt("M/d/yyyy"),
    fmt("dd-MMM-yyyy"),
    fmt("d-MMM-yyyy"),
    fmt("MMM d, yyyy"),
    fmt("MMMM d, yyyy"),
    fmt("d MMM yyyy"),
    fmt("d MMMM yyyy"),
    fmt("yyyyMMdd"),
    fmt("yyyy-MM"),
    fmt("MMM yyyy"),
    fmt("EEE MMM d HH:mm:ss yyyy"),
    fmt("EEE, d MMM yyyy HH:mm:ss")
  )

  /** Parse a single string leniently; None if no pattern matches. */
  def parseLenient(s: String): Option[Instant] = {
    if (s == null) return None
    val t = s.trim
    if (t.isEmpty) return None
    // epoch heuristics: 10-digit seconds / 13-digit millis, bounded to
    // 2001–2033 so zero-padded IDs/phone numbers don't promote to DATE
    if (t.matches("\\d{10}")) {
      val v = t.toLong
      if (v >= 1000000000L && v <= 2000000000L) return Some(Instant.ofEpochSecond(v))
      return None
    }
    if (t.matches("\\d{13}")) {
      val v = t.toLong
      if (v >= 1000000000000L && v <= 2000000000000L) return Some(Instant.ofEpochMilli(v))
      return None
    }
    var i = 0
    while (i < formats.length) {
      try {
        val parsed = formats(i).parse(t)
        val ld =
          if (parsed.isSupported(ChronoField.INSTANT_SECONDS))
            Instant.from(parsed)
          else if (parsed.isSupported(ChronoField.DAY_OF_MONTH))
            LocalDateTime.from(parsed).toInstant(ZoneOffset.UTC)
          else // year-month granularity
            YearMonth.from(parsed).atDay(1).atStartOfDay.toInstant(ZoneOffset.UTC)
        return Some(ld)
      } catch { case _: Exception => }
      i += 1
    }
    None
  }

  private val lenientUdf = udf { (s: String) =>
    parseLenient(s).map(i => new java.sql.Timestamp(i.toEpochMilli)).orNull
  }

  /** `lenient_date_parse(col)`: timestamp or null. */
  def lenient_date_parse(col: Column): Column = lenientUdf(col)

  private val isDateUdf = udf { (s: String) => s != null && parseLenient(s).isDefined }

  /** `is_parseable_date(col)`: boolean, for the promote-to-DATE vote. */
  def is_parseable_date(col: Column): Column = isDateUdf(col)
}
