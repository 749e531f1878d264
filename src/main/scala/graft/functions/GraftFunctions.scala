package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native graft kernels: registers them in the
  * session's FunctionRegistry so `spark.sql("SELECT graft_cosine(a,b)")`
  * works — the pure-SQL face of the library (extension ladder (b):
  * custom Catalyst expressions, exposed through the standard
  * `SparkSessionExtensions` hook rather than UDF wrappers, so SQL
  * callers get the same codegen/interpreted kernels as the Scala API).
  *
  * Two entry points:
  *  - `GraftExtensions` for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - `GraftFunctions.register(spark)` to add the functions to an
  *    already-running session.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** (name, arity-checked builder) for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args =>
      require(args.length == 2, "graft_cosine(vec, vec)")
      expressions.CosineSimilarity(args(0), args(1))
    },
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(vec, vec)")
      expressions.DotProduct(args(0), args(1))
    },
    "graft_minhash" -> { args =>
      require(args.length == 2, "graft_minhash(tokens, numHashes)")
      expressions.MinHashSignature(args(0), intArg(args(1), "numHashes"))
    },
    "graft_minhash_bands" -> { args =>
      require(args.length == 3, "graft_minhash_bands(tokens, numHashes, bands)")
      expressions.MinHashBands(args(0), intArg(args(1), "numHashes"),
        intArg(args(2), "bands"))
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(tokens, k)")
      expressions.ShingleSet(args(0), intArg(args(1), "k"))
    },
    "graft_simhash" -> { args =>
      require(args.length == 1, "graft_simhash(tokens)")
      expressions.SimHash64(args(0))
    },
    "graft_ngrams" -> { args =>
      require(args.length == 2, "graft_ngrams(tokens, k)")
      expressions.NGrams(args(0), intArg(args(1), "k"))
    },
    "graft_token_chunks" -> { args =>
      require(args.length == 3, "graft_token_chunks(tokens, size, stride)")
      expressions.TokenChunks(args(0), intArg(args(1), "size"),
        intArg(args(2), "stride"))
    },
    "graft_hyperplane_bands" -> { args =>
      require(args.length == 3, "graft_hyperplane_bands(vec, bits, bands)")
      expressions.HyperplaneBands(args(0), intArg(args(1), "bits"),
        intArg(args(2), "bands"), seed = 42)
    },
    "graft_winnow_fp" -> { args =>
      require(args.length == 3, "graft_winnow_fp(tokens, k, w)")
      expressions.WinnowFingerprint(args(0), intArg(args(1), "k"),
        intArg(args(2), "w"))
    },
    "graft_winnow_fp_set" -> { args =>
      require(args.length == 3, "graft_winnow_fp_set(tokens, k, w)")
      expressions.WinnowFingerprintSet(args(0), intArg(args(1), "k"),
        intArg(args(2), "w"))
    },
    "graft_repetition" -> { args =>
      require(args.length == 1, "graft_repetition(tokens)")
      expressions.RepetitionStats(args(0))
    },
    "graft_pq_adc" -> { args =>
      require(args.length == 3, "graft_pq_adc(codes, lut, ksub)")
      expressions.PqAdc(args(0), args(1), intArg(args(2), "ksub"))
    },
    "graft_interleave_bits" -> { args =>
      require(args.length == 2, "graft_interleave_bits(ranks, bits)")
      expressions.InterleaveBits(args(0), intArg(args(1), "bits"))
    },
    // The SQL face of the store's period arithmetic
    // (Collection.periodOfValue): maps an index value to the period KEY
    // its row lives under in a time layout — `GROUP BY
    // graft_period(time, 'monthly')` aggregates exactly along storage
    // boundaries. Composed from built-in date expressions (codegen'd,
    // session-tz-aware like every read/mutate path — evaluate in the
    // item's layout tz, the same rule the store enforces).
    "graft_period" -> { args =>
      require(args.length == 2, "graft_period(ts, layout)")
      import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Quarter}
      import org.apache.spark.sql.types.StringType
      val layout = args(1) match {
        case Literal(s, StringType) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"layout must be a string literal (daily|monthly|quarterly|yearly), got $other")
      }
      def fmt(pattern: String): Expression =
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          args(0), Literal(pattern), None)
      layout match {
        case "daily"   => fmt("yyyy-MM-dd")
        case "monthly" => fmt("yyyy-MM")
        case "yearly"  => fmt("yyyy")
        case "quarterly" =>
          Concat(Seq(fmt("yyyy"), Literal("-Q"), Cast(Quarter(args(0)), StringType)))
        case other => throw new IllegalArgumentException(
          s"unknown time layout '$other' (daily|monthly|quarterly|yearly)")
      }
    })

  /** Register every graft function into a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name),
        builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name),
        builder))
    }
}
