package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native expressions, so `spark.sql` models can
  * call them — the Spark-native analogue of the reference's function
  * namespace (`omnata_functions_database/schema` vars, README.md:133-138).
  *
  * Two paths:
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard `SparkSessionExtensions.injectFunction` route);
  *  - runtime: `GraftFunctions.registerAll(spark)` for an existing
  *    session (tests, notebooks).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** (name, builder) for every SQL-exposed graft function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hashes" -> { args =>
      ArrayExprs.ShingleHashes(args.head,
        if (args.size > 1) intArg(args(1), "n") else 3)
    },
    "graft_minhash_sig" -> { args =>
      ArrayExprs.MinHashSig(args.head,
        if (args.size > 1) intArg(args(1), "k") else 64)
    },
    "graft_simhash64" -> { args => ArrayExprs.SimHash64(args.head) },
    "graft_dot" -> { args => ArrayExprs.DotProductF(args.head, args(1)) },
    "graft_l2norm" -> { args => ArrayExprs.L2NormF(args.head) },
    "graft_lsh_buckets" -> { args =>
      ArrayExprs.LshBuckets(args.head, intArg(args(1), "tables"), intArg(args(2), "bits"))
    },
    "graft_sorted_pairs" -> { args => ArrayExprs.SortedPairs(args.head) },
    "graft_sorted_pairs_n" -> { args =>
      ArrayExprs.SortedPairsN(args.head,
        if (args.size > 1) doubleArg(args(1), "tau") else 0.0)
    },
    "graft_minhash_sig_md5" -> { args =>
      ArrayExprs.MinHashSigMd5(args.head,
        if (args.size > 1) intArg(args(1), "n") else 3,
        if (args.size > 2) intArg(args(2), "k") else 64)
    },
    "graft_simhash64_md5" -> { args => ArrayExprs.SimHash64Md5(args.head) },
    "graft_md5_mod" -> { args =>
      ArrayExprs.Md5Mod(args.head, longArg(args(1), "m"))
    })

  /** Register on a live session (idempotent). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.bridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ArrayExprs", name),
        builder))
    }
    // inert until spark.graft.rangeJoin.bandWidth is set (> 0)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinBandingRule(session))
  }
}
