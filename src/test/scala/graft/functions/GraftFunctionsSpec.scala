package graft.functions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {

  test("native expressions are callable from SQL after registerAll") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT graft_simhash64(split('a b c', ' ')) AS fp,
        |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       size(graft_shingle_hashes(split('a b c d e', ' '), 3)) AS ns,
        |       size(graft_minhash_sig(graft_shingle_hashes(split('a b c d e', ' ')), 16)) AS k,
        |       graft_l2norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       size(graft_lsh_buckets(array(CAST(1.0 AS FLOAT)), 4, 8)) AS t,
        |       graft_sorted_pairs(array(5L, 1L, 3L)) AS ps,
        |       size(graft_minhash_sig_md5(split('a b c d e', ' '), 3, 16)) AS km,
        |       graft_simhash64_md5(split('a b c', ' ')) AS fpm,
        |       graft_md5_mod('abc', 1000) AS mm,
        |       size(graft_sorted_pairs_n(
        |         array(named_struct('id', 1L, 'n', 4), named_struct('id', 2L, 'n', 9)),
        |         0.5)) AS pn
        |""".stripMargin).head()
    assert(row.getDouble(1) === 11.0)
    assert(row.getInt(2) === 3)
    assert(row.getInt(3) === 16)
    assert(row.getDouble(4) === 5.0)
    assert(row.getInt(5) === 4)
    assert(row.getSeq[org.apache.spark.sql.Row](6).map(r =>
      (r.getLong(0), r.getLong(1))) === Seq((1L, 3L), (1L, 5L), (3L, 5L)))
    assert(row.getInt(7) === 16)
    assert(row.get(8).isInstanceOf[Long])
    // pinned: md5_number_lower('abc') % 1000 (duckdb: ...838 % 1000)
    assert(row.getLong(9) === 838L)
    // min(4,9) < 0.5*9 -> the only pair is length-filtered out
    assert(row.getInt(10) === 0)
  }

  test("GraftExtensions builders construct valid expressions for every name") {
    // The injectFunction path only fires on brand-new sessions, which a
    // shared-session test JVM can't create cheaply; assert the builders
    // themselves (the part GraftExtensions injects) resolve and evaluate.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val floatArr = Literal.create(Array(3.0f, 4.0f), ArrayType(FloatType))
    val strArr = Literal.create(Array("a", "b", "c", "d"), ArrayType(StringType))
    val m = GraftFunctions.functions.toMap
    assert(m("graft_dot")(Seq(floatArr, floatArr)).eval(null) === 25.0)
    assert(m("graft_l2norm")(Seq(floatArr)).eval(null) === 5.0)
    assert(m("graft_simhash64")(Seq(strArr)).eval(null).isInstanceOf[Long])
    val sh = m("graft_shingle_hashes")(Seq(strArr, Literal(2))).eval(null)
    assert(sh.asInstanceOf[GenericArrayData].numElements() === 3)
    // applying the extension installer must not throw
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("ExactDoubleSum: true decimal sum, order-independent, null on empty") {
    import org.apache.spark.sql.functions._
    import ExactDoubleSum.exactSum
    // values chosen so naive left-to-right double addition visibly
    // loses low bits (1e16 + 7 repeated) — the exact sum must not
    val xs = Seq.tabulate(1000)(i => if (i % 2 == 0) 1.0e16 else 7.0)
    val expected = xs.map(new java.math.BigDecimal(_))
      .reduce(_.add(_)).doubleValue()
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
    val a = df.repartition(7).agg(exactSum(col("x"))).head().getDouble(0)
    val b = df.repartition(1).agg(exactSum(col("x"))).head().getDouble(0)
    assert(a === expected && b === expected, s"$a / $b vs $expected")
    assert(a !== xs.foldLeft(0.0)(_ + _), "fixture must expose naive-fold error")
    // SQL SUM semantics: no non-null input -> NULL
    val empty = df.filter(col("x") < 0).agg(exactSum(col("x"))).head()
    assert(empty.isNullAt(0))
    // survives serialize/deserialize across a group-by shuffle
    val grouped = spark.createDataFrame(xs.zipWithIndex.map { case (x, i) => (i % 3, x) })
      .toDF("g", "x").repartition(11)
      .groupBy("g").agg(exactSum(col("x")).as("s"))
      .orderBy("g").collect().map(_.getDouble(1))
    val byGroup = xs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(p => new java.math.BigDecimal(p._1)).reduce(_.add(_)).doubleValue())
    assert(grouped.toSeq === byGroup)
  }

  test("exactSum propagates NaN/Infinity like SQL SUM instead of throwing") {
    import ExactDoubleSum.exactSum
    import org.apache.spark.sql.functions.col
    def sumOf(xs: Seq[Double]): Double =
      spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
        .repartition(5) // forces serialize/deserialize + merge of partials
        .agg(exactSum(col("x"))).head().getDouble(0)
    assert(sumOf(Seq(1.0, Double.NaN, 2.0)).isNaN)
    assert(sumOf(Seq(1.0, Double.PositiveInfinity, 2.0)).isPosInfinity)
    assert(sumOf(Seq(Double.NegativeInfinity, 5.0)).isNegInfinity)
    // +Inf + -Inf = NaN, exactly what SUM(double) yields
    assert(sumOf(Seq(Double.PositiveInfinity, Double.NegativeInfinity)).isNaN)
    // NaN is sticky over Inf regardless of arrival order
    assert(sumOf(Seq(Double.PositiveInfinity, Double.NaN, 1.0e308)).isNaN)
  }
}
