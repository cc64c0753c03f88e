package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions as SQL functions so `spark.sql("SELECT
  * graft_simhash(text, 32) ...")` works next to the Column API.
  *
  * Activate with
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or at runtime via `GraftExtensions.register(spark)` (temp-function
  * registry — same builders, session-scoped).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    // fuse N scalar percentile calls into one array-percentile buffer
    // (measured 5-9x on multi-percentile aggregates; see the rule's
    // scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.FusePercentiles)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → expression builder (positional args as parsed from SQL). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> { args => PolyHashExpr(args.head) },
    "graft_minhash" -> { args =>
      MinHashSigExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 5,
        if (args.length > 2) intArg(args(2), "numHashes") else 16)
    },
    "graft_simhash" -> { args =>
      SimHashExpr(args.head,
        if (args.length > 1) intArg(args(1), "bits") else 32)
    },
    "graft_shingle_set" -> { args =>
      ShingleSetExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 5)
    },
    "graft_winnow_fp" -> { args =>
      WinnowFpExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 7,
        if (args.length > 2) intArg(args(2), "w") else 5)
    },
    "graft_ngram_hashes" -> { args =>
      NgramHashExpr(args.head,
        if (args.length > 1) intArg(args(1), "n") else 3)
    },
    "graft_char_sq_sum" -> { args => CharSqSumExpr(args.head) },
    "graft_char_hist" -> { args => CharHistExpr(args.head) },
    "graft_py_title" -> { args => PyTitleExpr(args.head) },
    "graft_dot" -> { args =>
      require(args.length == 2,
        s"graft_dot takes exactly 2 array arguments, got ${args.length}")
      DotProductExpr(args.head, args(1))
    },
    "graft_sqdist" -> { args =>
      require(args.length == 2,
        s"graft_sqdist takes exactly 2 array arguments, got ${args.length}")
      SqDistExpr(args.head, args(1))
    },
    "graft_rademacher" -> { args =>
      RademacherExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 16)
    })

  /** Runtime registration for sessions built without the extensions
    * config (tests, notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
