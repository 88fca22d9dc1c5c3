package graft.sources

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PNG figure sinks — the engine counterpart of the reference's
  * matplotlib outputs (`plotting.py:9-67` Venn figure saved to
  * `data/threeway_intersection*.png`; `:93-119` projection scatter),
  * rendered with the JDK's own `java.awt`/`ImageIO` so the sink adds
  * no dependency.
  *
  * Figures are driver-side BY DESIGN: the distributed part is the
  * aggregation that reduces the data to figure size (vennCounts3's
  * one full-outer pass; the projection operator), and what reaches
  * the renderer is catalog-sized — 7 region counts, or a
  * deterministically downsampled point cloud. A figure has ~10⁴
  * useful pixels; shipping 10⁹ points to a plot is wasted I/O at any
  * scale.
  */
object FigureSink {

  private val regionOrder =
    Seq("a_only", "b_only", "c_only", "ab_only", "ac_only", "bc_only", "abc")

  /** Three-circle Venn diagram with per-region counts.
    * `counts` is the output of [[graft.operators.Analyze.vennCounts3]]
    * (region: string, n: long — ≤ 7 rows). Missing regions render 0.
    */
  def vennPng(counts: DataFrame, path: String, labels: Seq[String] = Seq("A", "B", "C"),
              title: String = "", width: Int = 700, height: Int = 700): Unit = {
    require(labels.length == 3, "three set labels required")
    val byRegion = counts.select(col("region"), col("n").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, width, height)
      // circle geometry: classic 3-way layout (two on top, one below)
      val r = (width * 0.27).toInt
      val cx = Array(width / 2 - r / 2, width / 2 + r / 2, width / 2)
      val cy = Array(height / 2 - r / 3, height / 2 - r / 3, height / 2 + r / 2)
      // translucent fills in the reference's palette order
      val fills = Seq(new Color(148, 0, 211, 90), new Color(0, 191, 255, 90),
        new Color(0, 0, 255, 90))
      fills.zipWithIndex.foreach { case (c, i) =>
        g.setColor(c)
        g.fillOval(cx(i) - r, cy(i) - r, 2 * r, 2 * r)
      }
      g.setStroke(new BasicStroke(2f))
      g.setColor(Color.DARK_GRAY)
      (0 until 3).foreach(i => g.drawOval(cx(i) - r, cy(i) - r, 2 * r, 2 * r))
      // region count positions: singles at circle centers (pushed out),
      // pairwise at edge midpoints, triple at the centroid
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      g.setColor(Color.BLACK)
      def at(x: Int, y: Int, s: String): Unit = {
        val w = g.getFontMetrics.stringWidth(s)
        g.drawString(s, x - w / 2, y)
      }
      def n(reg: String): String = byRegion.getOrElse(reg, 0L).toString
      at(cx(0) - r / 2, cy(0), n("a_only"))
      at(cx(1) + r / 2, cy(1), n("b_only"))
      at(cx(2), cy(2) + r / 2, n("c_only"))
      at((cx(0) + cx(1)) / 2, (cy(0) + cy(1)) / 2 - r / 2, n("ab_only"))
      at((cx(0) + cx(2)) / 2 - r / 3, (cy(0) + cy(2)) / 2, n("ac_only"))
      at((cx(1) + cx(2)) / 2 + r / 3, (cy(1) + cy(2)) / 2, n("bc_only"))
      at((cx(0) + cx(1) + cx(2)) / 3, (cy(0) + cy(1) + cy(2)) / 3, n("abc"))
      // set labels outside their circles; title on top
      at(cx(0) - r, cy(0) - r - 8, labels(0))
      at(cx(1) + r, cy(1) - r - 8, labels(1))
      at(cx(2), cy(2) + r + 20, labels(2))
      if (title.nonEmpty) {
        g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 20))
        g.setColor(Color.ORANGE)
        at(width / 2, 30, title)
      }
    } finally g.dispose()
    writePng(img, path)
  }

  /** Two-circle Venn diagram — the reference's `C=None` default
    * (`plotting.py:9`): `counts` is the output of
    * [[graft.operators.Analyze.vennCounts2]] (region ∈ {a_only,
    * b_only, ab}; ≤ 3 rows). Missing regions render 0. Same
    * driver-side-by-design contract as the 3-circle sink. */
  def vennPng2(counts: DataFrame, path: String,
               labels: Seq[String] = Seq("A", "B"),
               title: String = "", width: Int = 700, height: Int = 500): Unit = {
    require(labels.length == 2, "two set labels required")
    val byRegion = counts.select(col("region"), col("n").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, width, height)
      val r = (width * 0.22).toInt
      val cy0 = height / 2
      val cx = Array(width / 2 - (r * 3) / 5, width / 2 + (r * 3) / 5)
      val fills = Seq(new Color(148, 0, 211, 90), new Color(0, 191, 255, 90))
      fills.zipWithIndex.foreach { case (c, i) =>
        g.setColor(c)
        g.fillOval(cx(i) - r, cy0 - r, 2 * r, 2 * r)
      }
      g.setStroke(new BasicStroke(2f))
      g.setColor(Color.DARK_GRAY)
      (0 until 2).foreach(i => g.drawOval(cx(i) - r, cy0 - r, 2 * r, 2 * r))
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      g.setColor(Color.BLACK)
      def at(x: Int, y: Int, s: String): Unit = {
        val w = g.getFontMetrics.stringWidth(s)
        g.drawString(s, x - w / 2, y)
      }
      def n(reg: String): String = byRegion.getOrElse(reg, 0L).toString
      at(cx(0) - r / 2, cy0, n("a_only"))
      at(cx(1) + r / 2, cy0, n("b_only"))
      at((cx(0) + cx(1)) / 2, cy0, n("ab"))
      at(cx(0) - r / 2, cy0 - r - 8, labels(0))
      at(cx(1) + r / 2, cy0 - r - 8, labels(1))
      if (title.nonEmpty) {
        g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 20))
        g.setColor(Color.ORANGE)
        at(width / 2, 30, title)
      }
    } finally g.dispose()
    writePng(img, path)
  }

  /** 2-d projection scatter (`plotting.py:93-119`'s UMAP figure).
    * `points` needs numeric `xCol`/`yCol`; rows beyond `maxPoints`
    * are dropped after a deterministic ORDER BY `orderCols` — the
    * driver-side render is bounded no matter the corpus size. */
  def scatterPng(points: DataFrame, xCol: String, yCol: String,
                 orderCols: Seq[String], path: String,
                 maxPoints: Int = 10000, width: Int = 800, height: Int = 600): Unit = {
    val rows = points
      .select(Seq(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")) ++ orderCols.map(col): _*)
      .na.drop(Seq("x", "y"))
      .orderBy(orderCols.map(col): _*)
      .limit(maxPoints)
      .select("x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, width, height)
      if (rows.nonEmpty) {
        val pad = 40
        val (xs, ys) = (rows.map(_._1), rows.map(_._2))
        val (x0, x1) = (xs.min, xs.max)
        val (y0, y1) = (ys.min, ys.max)
        def sx(x: Double) =
          if (x1 == x0) width / 2
          else pad + ((x - x0) / (x1 - x0) * (width - 2 * pad)).toInt
        def sy(y: Double) =
          if (y1 == y0) height / 2
          else height - pad - ((y - y0) / (y1 - y0) * (height - 2 * pad)).toInt
        g.setColor(Color.DARK_GRAY)
        g.drawRect(pad, pad, width - 2 * pad, height - 2 * pad)
        g.setColor(new Color(0, 114, 178, 160))
        rows.foreach { case (x, y) => g.fillOval(sx(x) - 3, sy(y) - 3, 6, 6) }
      }
    } finally g.dispose()
    writePng(img, path)
  }

  private def writePng(img: BufferedImage, path: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(ImageIO.write(img, "png", f), s"no PNG writer available for $path")
  }
}
