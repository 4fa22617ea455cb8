package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Exprs
import graft.operators.TrainedClf

/** The trained-classifier contract: the distributed closed-form training
  * pass is bit-identical to a sequential driver-side replica (features,
  * labels, masses, final weights), scoring matches brute force and is
  * partition-invariant, and the labels/gates are non-vacuous on the real
  * fixture.
  */
class TrainedClfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h60(s: String): Long = Md5Exprs.md5Top60(s.getBytes("UTF-8"))
  private def toks(text: String): Seq[String] =
    text.split(" ").toSeq.filter(_.length > 1)
  private def shingles(t: Seq[String]): Seq[String] =
    if (t.length < 2) Seq(t.mkString(" ")) else t.sliding(2).map(_.mkString(" ")).toSeq

  // a small corpus over a closed vocab; every doc has >= 2 tokens. ids
  // span md5 split buckets so both train and held-out are non-empty.
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "aa bb cc dd aa bb",
    2L -> "aa bb aa bb aa bb",
    3L -> "cc dd ee ff gg hh",
    4L -> "ee ff ee ff ee ff",
    5L -> "aa cc ee gg bb dd",
    6L -> "hh gg ff ee dd cc",
    7L -> "aa aa aa aa bb bb",
    8L -> "dd cc bb aa hh gg",
    9L -> "bb dd ff hh aa cc",
    10L -> "gg ee cc aa ff dd",
    11L -> "aa bb cc aa bb cc",
    12L -> "ff ff gg gg hh hh"
  )

  private def docFeats(tx: String): Map[Int, Long] =
    shingles(toks(tx))
      .groupBy(g => math.floorMod(h60(g), TrainedClf.Dim.toLong).toInt)
      .map { case (j, v) => j -> v.size.toLong }

  /** Pure-Scala replica of features + labels + the closed-form training. */
  private def reference(): (Map[String, Array[Long]], Map[(Long, String), Int]) = {
    // corpus bigram LM (the quality label's signal)
    val cxy = corpus.flatMap { case (_, tx) => shingles(toks(tx)) }
      .groupBy(identity).map { case (g, v) => g -> v.size.toLong }
    val cx = corpus.flatMap { case (_, tx) => toks(tx) }
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val lm: Map[Long, Long] = corpus.map { case (id, tx) =>
      val gs = shingles(toks(tx))
      val sc = gs.map(g => cxy(g) * 1000000L / cx(g.split(" ").head)).sum
      id -> sc / gs.size
    }.toMap
    val meanLm = lm.values.sum / lm.size
    val labels: Map[(Long, String), Int] = corpus.flatMap { case (id, tx) =>
      val t = toks(tx)
      val q = (id, TrainedClf.QualityCls) ->
        (if (lm(id) * 100L >= meanLm * 97L) 1 else 0)
      val tox = TrainedClf.ToxClasses.map { case (cls, thr) =>
        val hits = t.count(w => math.floorMod(h60(w + s"#lex:$cls"), TrainedClf.LexMod) == 0L)
        (id, cls) -> (if (t.nonEmpty && hits * 1000000L >= t.size.toLong * thr) 1 else 0)
      }
      q +: tox
    }.toMap
    val trainDocs = corpus.filter { case (id, _) => math.floorMod(h60(id.toString), 100L) < 80L }
    val w = TrainedClf.AllClasses.map { cls =>
      val cnt1 = Array.fill(TrainedClf.Dim)(0L)
      val cnt0 = Array.fill(TrainedClf.Dim)(0L)
      trainDocs.foreach { case (id, tx) =>
        val tgt = if (labels((id, cls)) == 1) cnt1 else cnt0
        docFeats(tx).foreach { case (j, c) => tgt(j) += c }
      }
      val m1 = cnt1.sum
      val m0 = cnt0.sum
      cls -> Array.tabulate(TrainedClf.Dim) { j =>
        TrainedClf.RateScale * (cnt1(j) + 1L) / (m1 + TrainedClf.Dim) -
          TrainedClf.RateScale * (cnt0(j) + 1L) / (m0 + TrainedClf.Dim)
      }
    }.toMap
    (w, labels)
  }

  test("distributed closed-form training == sequential driver replica, bit for bit") {
    val docs = corpus.toDF("doc_id", "text")
    val (refW, refLabels) = reference()
    // labels match
    val gotLabels = TrainedClf.labels(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(gotLabels === refLabels)
    // both label values occur somewhere (the tiny corpus is non-degenerate)
    assert(refLabels.values.toSet === Set(0, 1))
    // training lands on identical weights
    val (gotW, hist) = TrainedClf.train(docs)
    TrainedClf.AllClasses.foreach { cls =>
      assert(gotW(cls).toSeq === refW(cls).toSeq, s"weights diverge for $cls")
    }
    // the summary is per-class and internally consistent
    assert(hist.map(_.cls).sorted === TrainedClf.AllClasses.sorted)
    hist.foreach { h =>
      assert(h.wL1 === gotW(h.cls).map(math.abs).sum)
      assert(h.wSum === gotW(h.cls).sum)
      assert(h.nPos <= h.nTrain)
    }
  }

  test("scoring: margins equal brute force and are partition-invariant") {
    val docs = corpus.toDF("doc_id", "text")
    val (refW, _) = reference()
    val w = refW.map { case (c, a) => c -> (a.toIndexedSeq: IndexedSeq[Long]) }
    def marginsOf(df: org.apache.spark.sql.DataFrame) =
      TrainedClf.margins(df, w).collect()
        .map(r => r.getLong(0) -> TrainedClf.AllClasses.map(c => r.getAs[Long](s"m_$c")))
        .toMap
    val got = marginsOf(docs)
    corpus.foreach { case (id, tx) =>
      val expect = TrainedClf.AllClasses.map { c =>
        docFeats(tx).map { case (j, cnt) => cnt * refW(c)(j) }.sum
      }
      assert(got(id) === expect, s"doc $id")
    }
    assert(marginsOf(docs.repartition(7)) === got)
  }

  test("fixture labels and gates are non-vacuous (sf0.01)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val labelCounts = TrainedClf.labels(docs)
      .groupBy(col("cls"), col("y")).count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    TrainedClf.AllClasses.foreach { cls =>
      assert(labelCounts.getOrElse((cls, 1), 0L) > 0, s"$cls has no positives")
      assert(labelCounts.getOrElse((cls, 0), 0L) > 0, s"$cls has no negatives")
    }
    // the deployed quality gate separates: both keep values present
    val keeps = TrainedClf.qualityScores("/root/testdata/sf0.01", docs)
      .groupBy(col("clf_keep")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(keeps.getOrElse(true, 0L) > 0 && keeps.getOrElse(false, 0L) > 0,
      s"quality gate vacuous: $keeps")
    // the toxicity gate flags a minor lane, not nothing and not everything
    val toxKeep = TrainedClf.toxicityScores("/root/testdata/sf0.01", docs)
      .groupBy(col("tox_keep")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(toxKeep.getOrElse(true, 0L) > 0 && toxKeep.getOrElse(false, 0L) > 0,
      s"toxicity gate vacuous: $toxKeep")
    // held-out confusion: every head actually separates (no all-one-side
    // degenerate predictor slipped through training)
    val ev = TrainedClf.heldOutEval("/root/testdata/sf0.01", docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    TrainedClf.AllClasses.foreach { cls =>
      val (tp, fp, fn, tn) = ev(cls)
      assert(tp + fp > 0, s"$cls predicts no positives held-out")
      assert(fn + tn > 0, s"$cls predicts no negatives held-out")
      assert(tp + fp + fn + tn > 0)
    }
  }
}
