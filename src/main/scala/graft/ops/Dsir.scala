package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.{FixLog2, Md5BucketDeltaSum}
import graft.functions.ArrayExprs.md5Mod

/** Model-based data selection from the public curation literature:
  * a hashed-feature Naive Bayes quality classifier (the fasttext-style
  * "looks like the target corpus" filter of GPT-3/CCNet/phi pipelines)
  * and DSIR importance resampling (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" — hashed n-gram features,
  * importance weight = target/raw likelihood ratio, select the
  * highest-weight quarter).
  *
  * Both share one machinery: tokens hash into [[Buckets]] md5 buckets;
  * the count model is ONE map-side-combined aggregate (|model| = 1024
  * rows regardless of corpus size); scoring folds the per-token
  * log-likelihood-ratio deltas scan-locally via [[Md5BucketDeltaSum]]
  * with the model as a plan literal — zero shuffles, no corpus-sized
  * state. All log-domain arithmetic uses [[FixLog2]]'s integer
  * fixed-point log2 so scores are BIGINT-exact across engines (no
  * libm; see the cross-engine parity notes in SURVEY §8).
  *
  * The synthetic corpus draws every document's words from one
  * distribution, so class labels are PLANTED (the repo's md5-draw
  * fixture pattern): ~20% of docs are "pos" and gain eight marker
  * tokens drawn from an 8-word vocabulary (hq0..hq7); 1-in-7 neg docs
  * gain one marker as label noise. The derivation replays verbatim in the DuckDB twin;
  * what's exercised — count training, smoothing, broadcast scoring,
  * sign/quartile selection — is the honest algorithm a labeled corpus
  * would run, and DsirSpec checks it actually separates the classes.
  */
object Dsir {

  private val Buckets = 1024
  private val Salt = "dsir:"

  private def toksCol = TextAnalysis.tokens(lower(col("text")))

  /** Markers per planted-pos doc / marker vocabulary size: 8 draws from
    * an 8-word vocab gives ≈ 8·log2(n_t/n_r) ≈ 25 fixed-point bits of
    * class evidence — comfortably above the ≈ −0.2 bit/token smoothing
    * drift of a ~50-token document, so the classifier's margin reflects
    * the planted signal, not sample noise.
    */
  private val Markers = 8

  /** Planted-label fixture: (doc_id, text ⊕ markers, pos). */
  private def fixture(docs: DataFrame): DataFrame = {
    def draw(salt: String, m: Long): Column =
      md5Mod(concat(lit(salt + ":"), col("doc_id").cast("string")), m)
    def marker(j: Int): Column =
      concat(lit(" hq"), md5Mod(concat(lit("nbm:"), col("doc_id").cast("string"),
        lit(s":$j")), Markers.toLong).cast("string"))
    docs.select(col("doc_id"),
      concat(col("text"),
        when(draw("nbq", 5L) === 0,
          concat((0 until Markers).map(marker): _*))
          .otherwise(when(draw("nbn", 7L) === 0, marker(0)).otherwise(lit(""))))
        .as("text"),
      (draw("nbq", 5L) === 0).as("pos"))
  }

  /** NOTE: interpolated into `.stripMargin`ed twins — no line here may
    * start with `|` (a leading `||` would lose a pipe to the outer
    * stripMargin).
    */
  private def markerSql(j: Int): String =
    s"' hq' || CAST(md5_number_lower('nbm:' || CAST(doc_id AS VARCHAR) || ':$j') % $Markers AS VARCHAR)"

  private val fixtureSql: String =
    s"""fx AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN md5_number_lower('nbq:' || CAST(doc_id AS VARCHAR)) % 5 = 0
       |      THEN ${(0 until Markers).map(markerSql).mkString(" ||\n        ")}
       |      ELSE CASE WHEN md5_number_lower('nbn:' || CAST(doc_id AS VARCHAR)) % 7 = 0
       |        THEN ${markerSql(0)}
       |        ELSE '' END END AS text,
       |    md5_number_lower('nbq:' || CAST(doc_id AS VARCHAR)) % 5 = 0 AS pos
       |  FROM documents)""".stripMargin

  /** (deltas per bucket, cshift): deltas[b] = L(nPos[b]+1) − L(nNeg[b]+1),
    * cshift = L(Dneg+B) − L(Dpos+B) — the per-token smoothed
    * log-likelihood-ratio split into a bucket part and a token-count
    * part. Collected model is 1024 longs (bounded driver metadata, the
    * broadcast-dimension pattern).
    */
  private def countModel(docs: DataFrame): (Array[Long], Long) = {
    val rows = docs
      .select(col("pos"), explode(toksCol).as("w"))
      .select(col("pos"), md5Mod(concat(lit(Salt), col("w")), Buckets.toLong).as("bkt"))
      .groupBy("bkt")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      .collect()
    val np = new Array[Long](Buckets)
    val nn = new Array[Long](Buckets)
    rows.foreach { r => np(r.getLong(0).toInt) = r.getLong(1); nn(r.getLong(0).toInt) = r.getLong(2) }
    val deltas = Array.tabulate(Buckets)(b =>
      FixLog2.log2Fix16(np(b) + 1) - FixLog2.log2Fix16(nn(b) + 1))
    val cshift = FixLog2.log2Fix16(nn.sum + Buckets) - FixLog2.log2Fix16(np.sum + Buckets)
    (deltas, cshift)
  }

  // ---- Naive Bayes quality classifier -------------------------------------

  /** Train on the doc_id%5<4 split, score every document: score =
    * Σ_tokens delta[bucket] + n_tokens·cshift + prior, predict by sign.
    */
  def nbQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = fixture(Catalog(spark, dir).ref("documents"))
    val train = docs.filter(col("doc_id") % 5 < 4)
    val (deltas, cshift) = countModel(train)
    val priorRow = train
      .agg(sum(when(col("pos"), 1L).otherwise(0L)),
        sum(when(!col("pos"), 1L).otherwise(0L))).head()
    val prior = FixLog2.log2Fix16(math.max(1L, priorRow.getLong(0))) -
      FixLog2.log2Fix16(math.max(1L, priorRow.getLong(1)))
    docs
      .select(col("doc_id"), col("pos"), toksCol.as("toks"))
      .select(col("doc_id"),
        (Md5BucketDeltaSum(col("toks"), Salt, deltas.toSeq) +
          size(col("toks")).cast("long") * cshift + prior).as("score"),
        col("pos"))
      .select(col("doc_id"), col("score"),
        when(col("score") >= 0, "pos").otherwise("neg").as("pred"),
        when(col("pos"), "pos").otherwise("neg").as("label"))
      .orderBy("doc_id")
  }

  private def L(e: String): String = FixLog2.sqlL(e)

  val nbQualitySql: String =
    s"""WITH $fixtureSql,
       |toks AS (
       |  SELECT doc_id, pos,
       |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |  FROM fx),
       |tb AS (SELECT doc_id, pos,
       |              md5_number_lower('dsir:' || w) % 1024 AS bkt FROM toks),
       |model AS (
       |  SELECT bkt,
       |         count(*) FILTER (WHERE pos) + 1 AS np1,
       |         count(*) FILTER (WHERE NOT pos) + 1 AS nn1
       |  FROM tb WHERE doc_id % 5 < 4 GROUP BY bkt),
       |mdl AS (SELECT bkt, ${L("np1")} - ${L("nn1")} AS delta FROM model),
       |tot AS (SELECT sum(np1 - 1) AS dp, sum(nn1 - 1) AS dn FROM model),
       |dtr AS (
       |  SELECT greatest(1, count(*) FILTER (WHERE pos)) AS npos,
       |         greatest(1, count(*) FILTER (WHERE NOT pos)) AS nneg
       |  FROM fx WHERE doc_id % 5 < 4),
       |cst AS (SELECT ${L("(dn + 1024)")} - ${L("(dp + 1024)")} AS cshift,
       |               ${L("npos")} - ${L("nneg")} AS prior
       |        FROM tot, dtr),
       |sc AS (
       |  SELECT t.doc_id, sum(COALESCE(m.delta, 0)) AS sd, count(*) AS ntok
       |  FROM tb t LEFT JOIN mdl m USING (bkt) GROUP BY t.doc_id)
       |SELECT s.doc_id,
       |       CAST(s.sd + s.ntok * c.cshift + c.prior AS BIGINT) AS score,
       |       CASE WHEN s.sd + s.ntok * c.cshift + c.prior >= 0
       |            THEN 'pos' ELSE 'neg' END AS pred,
       |       CASE WHEN f.pos THEN 'pos' ELSE 'neg' END AS label
       |FROM sc s JOIN fx f USING (doc_id) CROSS JOIN cst c
       |ORDER BY doc_id""".stripMargin

  // ---- DSIR importance resampling -----------------------------------------

  /** Importance weight log2 w = Σ_tokens [L(n_t+1) − L(n_r+1)] +
    * n_tokens·[L(D_r+B) − L(D_t+B)]; keep the top ⌊N/4⌋ documents by
    * (weight desc, doc_id) — the deterministic top-quartile variant of
    * DSIR's importance selection (the paper's Gumbel resampling needs
    * continuous logs; rank selection keeps the score integer-exact).
    * Selection is a distributed TakeOrdered with a driver-known k,
    * never a global sort materialization.
    */
  def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = fixture(Catalog(spark, dir).ref("documents"))
    val (deltas, cshift) = countModel(docs)
    val k = (Catalog.cachedRowCount(spark, dir, "documents") / 4).toInt
    docs
      .select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"),
        (Md5BucketDeltaSum(col("toks"), Salt, deltas.toSeq) +
          size(col("toks")).cast("long") * cshift).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .orderBy("doc_id")
  }

  val dsirResampleSql: String =
    s"""WITH $fixtureSql,
       |toks AS (
       |  SELECT doc_id, pos,
       |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |  FROM fx),
       |tb AS (SELECT doc_id, pos,
       |              md5_number_lower('dsir:' || w) % 1024 AS bkt FROM toks),
       |model AS (
       |  SELECT bkt,
       |         count(*) FILTER (WHERE pos) + 1 AS nt1,
       |         count(*) FILTER (WHERE NOT pos) + 1 AS nr1
       |  FROM tb GROUP BY bkt),
       |mdl AS (SELECT bkt, ${L("nt1")} - ${L("nr1")} AS delta FROM model),
       |tot AS (SELECT sum(nt1 - 1) AS dt, sum(nr1 - 1) AS dr FROM model),
       |cst AS (SELECT ${L("(dr + 1024)")} - ${L("(dt + 1024)")} AS cshift FROM tot),
       |sc AS (
       |  SELECT t.doc_id, sum(COALESCE(m.delta, 0)) AS sd, count(*) AS ntok
       |  FROM tb t LEFT JOIN mdl m USING (bkt) GROUP BY t.doc_id),
       |scored AS (
       |  SELECT s.doc_id, CAST(s.sd + s.ntok * c.cshift AS BIGINT) AS score
       |  FROM sc s CROSS JOIN cst c),
       |sel AS (
       |  SELECT doc_id, score FROM scored
       |  QUALIFY row_number() OVER (ORDER BY score DESC, doc_id)
       |          <= (SELECT count(*) // 4 FROM documents))
       |SELECT doc_id, score FROM sel ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_nb" -> (nbQuality _),
    "text_dsir_resample" -> (dsirResample _))

  val oracles: Map[String, String] = Map(
    "text_quality_nb" -> nbQualitySql,
    "text_dsir_resample" -> dsirResampleSql)
}
