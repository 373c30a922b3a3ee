package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Z-order (Morton) data layout — the multi-dimensional clustering a
  * 100 TB lakehouse uses so that point/range filters on EITHER of two
  * dimensions prune most files (Delta/Iceberg's OPTIMIZE ZORDER): bit-
  * interleave the dimensions into one sort key, range-partition files by
  * it, and every file's min/max footprint stays tight on both columns at
  * once — where a single-column sort keeps the other column scattered
  * across every file.
  *
  * The z-value itself is pure integer arithmetic (dictionary rank of the
  * low-cardinality dimension from a broadcast 20-row dim table, raw
  * 16-bit value of the numeric one, bits interleaved by generated
  * shift-and-mask terms), so `layout_zvalue` hash-matches the DuckDB
  * twin exactly; the FILE-pruning payoff is asserted physically in
  * LayoutSpec by reading back `input_file_name()` spans under three
  * layouts (unsorted / one-column sort / z-order).
  */
object Layout {

  private val Bits = 8

  /** Interleaved z = Σ_b (bit b of a)·2^(2b+1) + (bit b of c)·2^(2b),
    * emitted as the same shift-mask-multiply term list for both engines.
    */
  private def zTermsSpark(a: String, c: String): String =
    (0 until Bits).flatMap { b =>
      Seq(s"(shiftright($a, $b) & 1) * ${1L << (2 * b + 1)}L",
        s"(shiftright($c, $b) & 1) * ${1L << (2 * b)}L")
    }.mkString(" + ")

  private def zTermsSql(a: String, c: String): String =
    (0 until Bits).flatMap { b =>
      Seq(s"(($a >> $b) & 1) * ${1L << (2 * b + 1)}",
        s"(($c >> $b) & 1) * ${1L << (2 * b)}")
    }.mkString(" + ")

  /** The oracle row: per-document z-value over (source rank, n_chars).
    *
    * Both dimensions are first NORMALIZED into the same 8-bit range by
    * their corpus min/max — ((v − min)·255) div max(1, max − min) — the
    * step naive interleaving skips and then silently degenerates into a
    * single-column sort: whichever raw dimension uses more bits owns the
    * top of every z-value, and the other column scatters again (measured
    * here before the fix: z-ordered source footprint ≈ the unsorted
    * baseline). Integer arithmetic throughout, non-negative operands, so
    * Spark `div` ≡ DuckDB `//` and the row hash-matches. The source
    * dictionary is the sorted-distinct rank — a 20-row broadcast dim,
    * the scale-correct way to integerize a low-cardinality string key —
    * and the min/max stats are one tiny aggregate cross-joined in
    * (1-row broadcast), which is what a table-stats catalog provides for
    * free at 100 TB.
    */
  def zvalue(spark: SparkSession, dir: String): DataFrame =
    zvalueOn(Catalog(spark, dir).ref("documents")).orderBy("doc_id")

  private[ops] def zvalueOn(docs: DataFrame): DataFrame = {
    val ranks = docs.select(col("source")).distinct()
      .withColumn("src_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("source"))) - 1)
    // all three normalization stats ride the one 1-row broadcast
    // aggregate — no eager driver-side count() job at plan-build time
    val stats = docs.agg(min(col("n_chars")).cast("long").as("cmin"),
      max(col("n_chars")).cast("long").as("cmax"),
      countDistinct(col("source")).cast("long").as("nsrc"))
    docs.select(col("doc_id"), col("source"), col("n_chars").cast("long").as("c"))
      .join(broadcast(ranks), Seq("source"))
      .crossJoin(broadcast(stats))
      .withColumn("src_bits",
        expr("(src_rank * 255) div greatest(1L, nsrc - 1)"))
      .withColumn("c_bits",
        expr("((c - cmin) * 255) div greatest(1L, cmax - cmin)"))
      .withColumn("z", expr(s"CAST(${zTermsSpark("src_bits", "c_bits")} AS BIGINT)"))
      .select(col("doc_id"), col("src_bits"), col("c_bits"), col("z"))
  }

  val zvalueSql: String =
    s"""WITH ranks AS (
       |  SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS src_rank
       |  FROM (SELECT DISTINCT source FROM documents)),
       |stats AS (
       |  SELECT CAST(min(n_chars) AS BIGINT) AS cmin,
       |         CAST(max(n_chars) AS BIGINT) AS cmax,
       |         CAST(count(DISTINCT source) AS BIGINT) AS nsrc
       |  FROM documents),
       |d AS (
       |  SELECT doc_id,
       |         (r.src_rank * 255) // greatest(1, s.nsrc - 1) AS src_bits,
       |         ((CAST(n_chars AS BIGINT) - s.cmin) * 255)
       |           // greatest(1, s.cmax - s.cmin) AS c_bits
       |  FROM documents JOIN ranks r USING (source) CROSS JOIN stats s)
       |SELECT doc_id, src_bits, c_bits,
       |       CAST(${zTermsSql("src_bits", "c_bits")} AS BIGINT) AS z
       |FROM d ORDER BY doc_id""".stripMargin

  /** Generalized z-value over up to 7 named dimensions, appended as
    * `zName` — the reusable form of [[zvalueOn]]'s (source, n_chars)
    * derivation for OPTIMIZE-ZORDER-style maintenance
    * ([[Compaction.compactDir]]): string dims integerize through a
    * sorted-distinct rank dictionary (broadcast — the low-cardinality
    * contract of a clustering key), numeric dims min/max-normalize into
    * the same 8-bit range (1-row broadcast stats aggregate — what a
    * table-stats catalog serves from metadata at 100 TB), and bit b of
    * dim i interleaves to position b·k + (k−1−i), so k = 2 reproduces
    * [[zvalueOn]]'s layout exactly. Null dimension values normalize to
    * bucket 0 rather than dropping the row — a maintenance rewrite must
    * never lose data.
    */
  private[graft] def withZValue(df: DataFrame, dims: Seq[String],
      zName: String = "__z"): DataFrame = {
    require(dims.nonEmpty && dims.length <= 7,
      s"zorder supports 1..7 dimensions, got ${dims.length}")
    val k = dims.length
    val schema = df.schema
    val isString = dims.map(d =>
      schema(d).dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
    // one 1-row stats aggregate covers every dimension's normalizer
    val statAggs = dims.zipWithIndex.flatMap { case (d, i) =>
      if (isString(i)) Seq(countDistinct(col(d)).cast("long").as(s"__zn_$i"))
      else Seq(min(col(d)).cast("long").as(s"__zmin_$i"),
        max(col(d)).cast("long").as(s"__zmax_$i"))
    }
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val withDicts = dims.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (acc, (d, i)) if isString(i) =>
        // NULLS are excluded from the dictionary (countDistinct skips
        // them too): ranks run 0..n-1 so the top value maps to bucket
        // 255 exactly; null rows miss the join and coalesce to 0.
        val ranks = df.select(col(d)).filter(col(d).isNotNull).distinct()
          .withColumn(s"__zr_$i",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col(d))).cast("long") - 1)
        acc.join(broadcast(ranks), Seq(d), "left")
      case (acc, _) => acc
    }
    val bitCols = dims.zipWithIndex.map { case (d, i) =>
      if (isString(i))
        coalesce(expr(s"(__zr_$i * 255) div greatest(1L, __zn_$i - 1)"), lit(0L))
      else
        // DOUBLE normalization: (v - min) * 255 in BIGINT overflows on
        // wide-range columns (64-bit hashes/fingerprints) and even
        // max - min can wrap; 256 buckets need 8 bits of precision, so
        // double is exact wherever the integer div was (< 2^53) and
        // merely approximate — never garbage — beyond it. Clamped to
        // [0, 255]; null normalizes to bucket 0 (a maintenance rewrite
        // must never lose the row).
        coalesce(expr(
          s"least(255L, greatest(0L, CAST(floor((CAST($d AS DOUBLE) - CAST(__zmin_$i AS DOUBLE)) * 255.0D" +
            s" / greatest(1.0D, CAST(__zmax_$i AS DOUBLE) - CAST(__zmin_$i AS DOUBLE))) AS BIGINT)))"),
          lit(0L))
    }
    val withBits = bitCols.zipWithIndex.foldLeft(withDicts) {
      case (acc, (c, i)) => acc.withColumn(s"__zb_$i", c)
    }
    val zTerms = (0 until Bits).flatMap { b =>
      (0 until k).map(i =>
        s"(shiftright(__zb_$i, $b) & 1) * ${1L << (b * k + (k - 1 - i))}L")
    }.mkString(" + ")
    withBits
      .withColumn(zName, expr(s"CAST($zTerms AS BIGINT)"))
      .drop((0 until k).flatMap(i =>
        Seq(s"__zb_$i", s"__zr_$i", s"__zn_$i", s"__zmin_$i", s"__zmax_$i")): _*)
  }

  /** Write `docs` into `nFiles` files under the given layout:
    * "none" (hash repartition — the streaming-ingest default),
    * "source" (single-column range sort), or "zorder" (range by z).
    * Returns the written relation re-read with its file name, for
    * footprint assertions.
    */
  private[ops] def writeLayout(spark: SparkSession, docs: DataFrame,
      path: String, nFiles: Int, layout: String): DataFrame = {
    val out = layout match {
      case "none" => docs.repartition(nFiles)
      case "source" => docs.repartitionByRange(nFiles, col("source"), col("doc_id"))
      case "zorder" =>
        zvalueOn(docs).select(col("doc_id").as("zdoc"), col("z"))
          .join(docs, col("zdoc") === col("doc_id"))
          .repartitionByRange(nFiles, col("z"), col("doc_id"))
          .drop("zdoc", "z")
      case other => throw new IllegalArgumentException(s"layout $other")
    }
    out.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .withColumn("file", input_file_name())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zvalue" -> (zvalue _))

  val oracles: Map[String, String] = Map(
    "layout_zvalue" -> zvalueSql)
}
