package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}
import graft.util.Cols._

/** Pins that the quantizer/PQ hot paths generate COMPILABLE code — i.e.
  * never hit janino's 64 KB method limit and silently fall back to
  * interpreted execution (the round-8 wart: the unrolled literal-centroid
  * trees fused under a Generate logged 8× `Failed to compile` during
  * `sbt test` and ran interpreted — correct, but exactly the plan you do
  * not want for a per-vector × per-centroid argmax at 100 TB).
  *
  * Detection: a log4j2 appender on the root logger captures
  * `CodeGenerator: Failed to compile` ERROR events while the previously
  * offending shapes run. Also pins bit-identity of the native loop kernels
  * ([[graft.functions.ArgmaxCosineCell]], [[graft.functions.PqArgminCode]],
  * [[graft.functions.TopCellsByCosine]]) against the composed
  * literal-struct formulations they replaced.
  */
class CodegenFallbackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def capturedCodegenErrors(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val appender =
      new AbstractAppender("graft-codegen-capture", null, null, false, Property.EMPTY_ARRAY) {
        override def append(e: LogEvent): Unit = {
          val msg = e.getMessage.getFormattedMessage
          if (msg.contains("Failed to compile")) errors.synchronized { errors += msg }
        }
      }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    try body
    finally {
      rootCfg.removeAppender("graft-codegen-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    errors.toSeq
  }

  test("PQ training + quantizer assignment compile clean (no interpreted fallback)") {
    val emb = Tables.embeddings(spark, sf)
    val errs = capturedCodegenErrors {
      // the round-8 offender: codeOf literals fused under the training explode
      Pq.trainCodebooks(emb, m = 8, ksub = 16, dim = 64, iters = 1)
      // the d_semantic-shaped plan: scaled cells + centroid agg + pair join
      Similarity
        .semanticDedupScaled(emb, threshold = 0.35, targetCellSize = 50, maxCellSize = 100)
        .count()
    }
    assert(errs.isEmpty, s"codegen fell back to interpreted:\n${errs.take(2).mkString("\n")}")
  }

  test("unigram segmentation compiles clean and matches the udf formulation it replaced") {
    import graft.operators.{TextAnalysis, Unigram}
    val words = TextAnalysis
      .wordCounts(Tables.documents(spark, sf))
      .select(col("token").as("word"), col("cnt"))
    val pieces = Unigram.train(words, vocabSize = 48, maxPieceLen = 4, rounds = 2)
    val errs = capturedCodegenErrors {
      // the t_unigram_encode hot shape: native DP over the distinct-word
      // frame, then the stats aggregate
      assert(Unigram.segmentWords(words, pieces, maxPieceLen = 4).count() > 0)
    }
    assert(errs.isEmpty, s"unigram segment fell back:\n${errs.take(2).mkString("\n")}")
    // bit-identity with the retired udf path
    val vm = pieces
      .select(col("piece"), col("freq"))
      .as[(String, Long)]
      .collect()
      .toMap
    val bc = spark.sparkContext.broadcast(vm)
    val segUdf = udf { (w: String) => graft.functions.UnigramViterbi.segment(bc.value, 4, w) }
    val viaUdf = words
      .withColumn("seg", segUdf(col("word")))
      .select(
        col("word"),
        col("seg._1").cast("long").as("n_pieces"),
        col("seg._2").as("score"),
        col("seg._3").as("pieces")
      )
      .as[(String, Long, Long, String)]
      .collect()
      .sortBy(_._1)
      .toSeq
    val viaNative = Unigram
      .segmentWords(words, pieces, 4)
      .select("word", "n_pieces", "score", "pieces")
      .as[(String, Long, Long, String)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(viaNative === viaUdf)
  }

  test("ArgmaxCosineCell matches the composed array_max(struct(cosine, cell)) form") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.seedCentroids(emb, k = 12)
    val composed = array_max(
      array(cents.map { case (cell, v) =>
        struct(cosine(col("embedding"), typedLit(v.toSeq)).as("sim"), lit(cell).as("cell"))
      }.toIndexedSeq: _*)
    ).getField("cell")
    val native = nativeCol(graft.functions.ArgmaxCosineCell(nativeExpr(col("embedding")), cents))
    val diff = emb.select(col("vec_id"), composed.as("c"), native.as("n")).filter(col("c") =!= col("n"))
    assert(diff.count() === 0L, diff.limit(5).collect().mkString(", "))
  }

  test("PqArgminCode matches the composed array_min(struct(d2, code)) form") {
    val emb = Tables.embeddings(spark, sf)
    val cb = Pq.seedCodebooks(emb, m = 8, ksub = 16, dim = 64)
    val (b, dsub) = (3, 8)
    val xs = slice(col("embedding"), b * dsub + 1, dsub)
    val composed = array_min(
      array(cb(b).zipWithIndex.map { case (c, j) =>
        val cs = typedLit(c.toSeq)
        struct(
          ((dot(xs, xs) - lit(2.0) * dot(xs, cs)) + lit(c.map(v => v * v).sum)).as("d2"),
          lit(j.toLong).as("code")
        )
      }.toIndexedSeq: _*)
    ).getField("code")
    val native = nativeCol(graft.functions.PqArgminCode(nativeExpr(col("embedding")), cb(b), b * dsub, dsub))
    val diff = emb.select(col("vec_id"), composed.as("c"), native.as("n")).filter(col("c") =!= col("n"))
    assert(diff.count() === 0L, diff.limit(5).collect().mkString(", "))
  }

  test("TopCellsByCosine matches the composed reverse(array_sort)+slice ranking") {
    val emb = Tables.embeddings(spark, sf)
    // deliberately UNordered cell ids: tie-break must follow cell id, not
    // centroid-table position (persisted centroid tables arrive unordered)
    val cents = Similarity.seedCentroids(emb, k = 9).reverse
    val nProbe = 3
    val ranked = reverse(
      array_sort(
        array(cents.map { case (cell, v) =>
          struct(cosine(col("embedding"), typedLit(v.toSeq)).as("sim"), lit(cell).as("cell"))
        }.toIndexedSeq: _*)
      )
    )
    val composed = transform(slice(ranked, 1, nProbe), s => s.getField("cell"))
    val native =
      nativeCol(graft.functions.TopCellsByCosine(nativeExpr(col("embedding")), cents, nProbe))
    val diff = emb
      .select(col("vec_id"), composed.as("c"), native.as("n"))
      .filter(not(col("c") === col("n")))
    assert(diff.count() === 0L, diff.limit(5).collect().mkString(", "))
  }
}
