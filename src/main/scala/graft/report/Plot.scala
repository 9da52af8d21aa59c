package graft.report

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, RenderingHints}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import javax.imageio.ImageIO

/** Rendered figures for the report surface — the pixel half of the
  * reference's `utils/visualization.py:63-349` (seaborn line + detection
  * scatter, mapping scatter plots), JDK-only (`java.awt` + `javax.imageio`,
  * the same stack the multimodal codec already uses; no plotting dependency
  * exists offline and none is needed for these figures).
  *
  * Deliberately driver-local like [[graft.ml.Tsne]]: a figure is plot-sized
  * by contract — the distributed engine reduces (report reshape, PCA/t-SNE
  * sample) and the renderer draws the ≤ `MaxPoints` rows those stages emit.
  * Oversized input is a contract violation, not a scaling path. */
object Plot {

  val MaxPoints = 20000

  private val palette: Array[Color] = Array(
    new Color(31, 119, 180), new Color(255, 127, 14), new Color(44, 160, 44),
    new Color(214, 39, 40), new Color(148, 103, 189), new Color(140, 86, 75),
    new Color(227, 119, 194), new Color(127, 127, 127), new Color(188, 189, 34),
    new Color(23, 190, 207))

  private def canvas(w: Int, h: Int): (BufferedImage, java.awt.Graphics2D) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_OFF)
    g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
    g.setColor(Color.GRAY); g.drawRect(40, 20, w - 60, h - 60)
    (img, g)
  }

  private def scaled(vs: Array[Double], lo: Int, hi: Int): Array[Int] = {
    val mn = vs.min; val mx = vs.max
    val span = if (mx > mn) mx - mn else 1.0
    vs.map(v => lo + ((v - mn) / span * (hi - lo)).round.toInt)
  }

  /** 2-D scatter of (xCol, yCol) colored by `labelCol` — the mapping/t-SNE
    * figure. Returns the written path. */
  def scatterPng(df: DataFrame, xCol: String, yCol: String, labelCol: String,
                 path: String, width: Int = 800, height: Int = 600): String = {
    val rows = df.select(col(xCol).cast("double"), col(yCol).cast("double"),
      col(labelCol).cast("string")).collect()
    require(rows.length > 0 && rows.length <= MaxPoints,
      s"plot-sized input contract: ${rows.length} rows (max $MaxPoints)")
    val xs = scaled(rows.map(_.getDouble(0)), 45, width - 25)
    val ys = scaled(rows.map(_.getDouble(1)), height - 45, 25) // y up
    val labels = rows.map(_.getString(2)).distinct.sorted
    val colorOf = labels.zipWithIndex
      .map { case (l, i) => l -> palette(i % palette.length) }.toMap
    val (img, g) = canvas(width, height)
    rows.indices.foreach { i =>
      g.setColor(colorOf(rows(i).getString(2)))
      g.fillRect(xs(i) - 2, ys(i) - 2, 4, 4)
    }
    g.dispose()
    ImageIO.write(img, "png", new java.io.File(path))
    path
  }

  /** The experiment-report figure ([[graft.operators.Report.experimentReport]]
    * output): accuracy timeline as a line, Warning/Drift firings as colored
    * markers — the engine's twin of the reference's visualize_* figures. */
  def reportPng(report: DataFrame, path: String,
                width: Int = 1000, height: Int = 400): String = {
    val rows = report.select(col("time").cast("long"),
        col("accuracy").cast("double"), col("detection"))
      .orderBy("time").collect()
    require(rows.length > 0 && rows.length <= MaxPoints,
      s"plot-sized input contract: ${rows.length} rows (max $MaxPoints)")
    val xs = scaled(rows.map(_.getLong(0).toDouble), 45, width - 25)
    val ys = scaled(rows.map(_.getDouble(1)), height - 45, 25)
    val (img, g) = canvas(width, height)
    g.setColor(palette(0))
    g.setStroke(new BasicStroke(1.5f))
    (1 until rows.length).foreach { i =>
      g.drawLine(xs(i - 1), ys(i - 1), xs(i), ys(i))
    }
    rows.indices.foreach { i =>
      rows(i).getString(2) match {
        case "Warning" =>
          g.setColor(palette(1)); g.fillOval(xs(i) - 4, ys(i) - 4, 8, 8)
        case "Drift" =>
          g.setColor(palette(3)); g.fillOval(xs(i) - 5, ys(i) - 5, 10, 10)
        case _ => ()
      }
    }
    g.dispose()
    ImageIO.write(img, "png", new java.io.File(path))
    path
  }
}
