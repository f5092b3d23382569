package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K8 — console sink: driver-side rendering of collected rows as an
  * aligned text table (the reference's rich-console panels,
  * ethical_crawler.py:1187–1198, :1237–1266). Strictly a presentation
  * layer over `collect()`ed rows — callers bound the row count first
  * (`limit`); nothing here touches the distributed plan.
  */
object Render {

  /** O4/F10 — presentation truncation: text columns cut at `max`
    * chars with an ellipsis (ethical_crawler.py:1244
    * `description[:200] + '...'`). A Column expression, usable both
    * in queries and pre-render.
    */
  def truncated(c: Column, max: Int): Column =
    when(length(c) > max, concat(substring(c, 1, max), lit("...")))
      .otherwise(c)

  /** Render up to `maxRows` rows as an aligned table string. */
  def table(df: DataFrame, maxRows: Int = 20, maxColWidth: Int = 40)
      : String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect().map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "NULL" else r.get(i).toString
        if (v.length > maxColWidth) v.take(maxColWidth) + "..." else v
      }
    }
    val widths = cols.indices.map { i =>
      (cols(i).length +: rows.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(cols.toSeq), sep) ++ rows.map(line) :+ sep)
      .mkString("\n")
  }
}
