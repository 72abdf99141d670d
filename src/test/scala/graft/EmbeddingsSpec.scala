package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Embeddings, Similarity}

/** Embedding preprocessing: normalization invariants, quantization error
  * bounds and portable rounding, centroid order-independence, and the
  * narrow plan shapes. */
class EmbeddingsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // max|x| = 127 in every non-zero vector => scale is EXACTLY 1.0, so the
  // expected quantized values below are exact, not rounding-dependent
  private lazy val vecs = Seq(
    (1L, "a", Array(127.0f, 2.0f, -2.0f)),
    (2L, "a", Array(0.5f, -0.5f, 127.0f)),
    (3L, "b", Array(0.0f, 0.0f, 0.0f)), // zero vector
    (4L, "b", Array(-127.0f, 0.25f, 4.0f))
  ).toDF("vec_id", "label", "embedding")

  test("nearestCentroidConfusion: separable clusters land on the " +
    "diagonal; zero vectors drop") {
    val rows = (Seq.tabulate(10)(i =>
        (i.toLong, 0, Array(1.0f, 0.01f * i))) ++
      Seq.tabulate(10)(i =>
        (100L + i, 1, Array(0.01f * i, 1.0f))) ++
      Seq((999L, 0, Array(0.0f, 0.0f))) // zero norm: no comparable centroid
    ).toDF("vec_id", "label", "embedding")
    val out = Embeddings.nearestCentroidConfusion(rows, "embedding", "label")
      .collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)), out.mkString(","))
    assert(out.map(_.getAs[Long]("n")).sum == 20) // 999 dropped
  }

  test("nearestCentroidConfusion: null-label and null-embedding rows " +
    "DROP — confusion identical with them present (r10 contract)") {
    val clean = Seq(
      (1L, Some(0), Some(Array(1.0f, 0.0f))),
      (2L, Some(0), Some(Array(1.0f, 0.1f))),
      (3L, Some(1), Some(Array(0.0f, 1.0f))),
      (4L, Some(1), Some(Array(0.1f, 1.0f))))
    // a null label must not mint a null-keyed centroid (which would
    // both absorb mass and appear as a pred class); a null embedding
    // has nothing to assign
    val polluted = clean ++ Seq(
      (5L, Option.empty[Int], Some(Array(1.0f, 0.0f))),
      (6L, Some(0), Option.empty[Array[Float]]))
    def confusion(rows: Seq[(Long, Option[Int], Option[Array[Float]])]) =
      Embeddings.nearestCentroidConfusion(
          rows.toDF("vec_id", "label", "embedding"), "embedding", "label")
        .orderBy("label", "pred").collect().map(_.toSeq).toSeq
    assert(confusion(clean).map(_.last.asInstanceOf[Long]).sum == 4L)
    assert(confusion(polluted) == confusion(clean))
  }

  test("nearestCentroidConfusion plan: one-row centroid broadcast, " +
    "narrow argmax (no window, no per-vector exchange)") {
    val rows = Seq((1L, 0, Array(1.0f, 0.0f)), (2L, 1, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val p = Embeddings.nearestCentroidConfusion(rows, "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row centroid set
    assert(!p.contains("Window"), p)                 // argmax is array_max
  }

  test("principalAxis: anisotropic data recovers the dominant axis with " +
    "canonical sign; bit-identical under repartition") {
    // variance ~100:1 along dim 0 of 4
    val rows = (0 until 40).map { i =>
      (i.toLong, Array(((i % 20) - 9.5f) / 10f, ((i % 3) - 1f) / 100f,
        0.0f, 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (v, mu) = Embeddings.principalAxisVectors(df, "embedding")
    assert(math.abs(v(0)) > 0.99, v.mkString(","))
    assert(v(0) > 0) // canonical sign: dominant loading positive
    assert(math.abs(mu(0)) < 0.01 && math.abs(mu(2)) < 1e-9)
    // projections follow the dim-0 coordinate (centered, within the
    // lattice + minor-axis tolerance)
    val proj = Embeddings.principalAxis(df, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, e) =>
      assert(math.abs(proj(id) - (e(0) - mu(0)) * v(0)) < 0.02) }
    // the integer-lattice covariance makes the whole operator
    // partition-order independent — EXACT equality, not tolerance
    val proj2 = Embeddings.principalAxis(df.repartition(7), "embedding",
      "vec_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(proj == proj2)
    // k=2 with one Hotelling deflation: the second axis is the
    // second-variance dimension, orthogonal to the first
    val (pcs, _) = Embeddings.principalComponentVectors(df, "embedding", 2)
    assert(math.abs(pcs(1)(1)) > 0.99 && pcs(1)(1) > 0, pcs(1).mkString(","))
    assert(math.abs(pcs.head.zip(pcs(1)).map { case (a, b) => a * b }.sum)
      < 1e-6)
    assert(Embeddings.principalComponents(df, "embedding", "vec_id", 2)
      .columns.toSeq == Seq("vec_id", "proj_1", "proj_2"))
    // the static cap cannot know λ: overflow of the unnormalized
    // iterate is detected at runtime, loudly — never a silent NaN axis
    val boom = intercept[IllegalArgumentException] {
      Embeddings.principalAxisVectors(df, "embedding", iters = 120)
    }
    assert(boom.getMessage.contains("overflowed"))
    // empty input fails with a message, not an index error
    val empty = intercept[IllegalArgumentException] {
      Embeddings.principalAxisVectors(df.filter(lit(false)), "embedding")
    }
    assert(empty.getMessage.contains("at least one row"))
  }

  test("removeTopComponents: Pythagoras over orthonormal axes, k=1 " +
    "projection parity, corrected mass off the removed axes") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array(((i % 20) - 9.5f) / 10f, ((i % 3) - 1f) / 100f,
        ((i % 5) - 2f) / 1000f, 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Embeddings.removeTopComponents(df, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.size == 40)
    out.values.foreach { case (p1, p2, nb, na) =>
      // axes are orthonormal, so removed mass obeys Pythagoras:
      // na² + p1² + p2² == nb² (rounding tolerance only)
      assert(math.abs(na * na + p1 * p1 + p2 * p2 - nb * nb) < 1e-4,
        s"$p1 $p2 $nb $na")
      assert(na <= nb + 1e-9)
    }
    // dominant-axis mass is GONE: dim 0 has ~100:1 variance, so the
    // corrected norms collapse far below the originals on average
    val shrink = out.values.map { case (_, _, nb, na) => na / math.max(nb, 1e-12) }
    assert(shrink.sum / shrink.size < 0.25, shrink.sum / shrink.size)
    // k=1 projections == principalAxis's (same machinery, same rounding)
    val p1s = Embeddings.removeTopComponents(df, "embedding", "vec_id", k = 1)
      .select($"vec_id", $"proj_1").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ax = Embeddings.principalAxis(df, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p1s == ax)
    // reserved-column guard
    intercept[IllegalArgumentException] {
      Embeddings.removeTopComponents(
        df.withColumn("norm_after", lit(1)), "embedding", "vec_id")
    }
  }

  test("randomProject: deterministic, linear, equals the manual dot (x60)") {
    val planes = graft.ext.Similarity.hyperplanes(4, 3, seed = 42L)
    val df = Seq((1L, Array(1.0f, 2.0f, -2.0f)), (2L, Array(2.0f, 4.0f, -4.0f)))
      .toDF("vec_id", "embedding")
    def proj(): Map[Long, Seq[Double]] =
      Embeddings.randomProject(df, "embedding", "proj", planes)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toSeq).toMap
    val p1 = proj()
    assert(p1 == proj(), "seeded planes must make the projection deterministic")
    assert(p1(1L).size == 4)
    // projection is linear: proj(2v) == 2*proj(v) exactly (doubles scale
    // by a power of two — no rounding)
    assert(p1(2L) == p1(1L).map(_ * 2.0))
    // component 0 equals the hand-computed scaled dot
    val v = Seq(1.0, 2.0, -2.0)
    val expect0 = v.zip(planes.head).map { case (a, b) => a * b }
      .foldLeft(0.0)(_ + _) / math.sqrt(4.0)
    assert(p1(1L).head == expect0)
  }

  test("l2Normalize: unit norms, zero vectors pass through, norm column exact") {
    val df = Seq((1L, Array(1.0f, 2.0f, -2.0f)), (3L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.l2Normalize(df, "embedding", "nv")
      .select($"vec_id", $"nv", $"nv_norm")
      .collect().map(r => (r.getLong(0), (r.getSeq[Double](1), r.getDouble(2))))
      .toMap
    assert(math.abs(out(1L)._2 - 3.0) < 1e-15) // sqrt(1+4+4)
    assert(math.abs(out(1L)._1.map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(3L)._1 == Seq(0.0, 0.0, 0.0) && out(3L)._2 == 0.0)
  }

  test("quantizeInt8: round-half-up fixture, clamp range, max hits ±127") {
    // scale = 1 exactly; 63.5 -> 64 (half-up), -63.5 -> -63
    val one = Seq((1L, Array(127.0f, 63.5f, -63.5f, 0.0f, -127.0f)))
      .toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(one, "embedding", "qv")
      .select($"qv").head.getSeq[Int](0)
    assert(q == Seq(127, 64, -63, 0, -127))
  }

  test("quantizeInt8: dequantization error ≤ scale/2, zero vector -> zeros") {
    val rows = Embeddings.quantizeInt8(vecs, "embedding", "qv")
      .select($"embedding", $"qv", $"qv_scale").collect()
    rows.foreach { r =>
      val e = r.getSeq[Float](0).map(_.toDouble)
      val q = r.getSeq[Int](1)
      val s = r.getDouble(2)
      assert(q.forall(x => x >= -127 && x <= 127))
      e.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * s) <= s / 2 + 1e-12,
          s"x=$x q=$qi scale=$s")
      }
    }
  }

  test("groupCentroids: matches brute force and is partition-order independent") {
    val q = Embeddings.quantizeInt8(vecs, "embedding", "qv")
    val a = Embeddings.groupCentroids(q, "qv", "label")
    val b = Embeddings.groupCentroids(q.repartition(7), "qv", "label")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "centroids must not depend on partitioning")
    val got = a.filter($"label" === "a" && $"dim" === 0)
      .select($"q_sum", $"n_vecs", $"q_mean").head
    // label a, dim 0 (scale exactly 1): q(127.0)=127, q(0.5)=1 -> sum 128
    assert(got.getLong(0) == 128L && got.getLong(1) == 2L
      && got.getDouble(2) == 64.0)
  }

  test("groupCentroids plan: vecsum reduces map-side; explode AFTER the agg") {
    val q = Embeddings.quantizeInt8(vecs, "embedding", "qv")
    val out = Embeddings.groupCentroids(q.repartition(4), "qv", "label")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("partial_vectorsumlong"),
      "vector sums must partial-aggregate before the shuffle:\n" + p)
    // tree prints parents first: the Generate (posexplode) node must sit
    // ABOVE the final aggregate, i.e. dims explode on |groups| rows only
    val gen = p.indexOf("Generate")
    val agg = p.indexOf("ObjectHashAggregate")
    assert(gen >= 0 && agg > gen,
      "posexplode must run after aggregation:\n" + p)
  }

  test("vecsum rejects inconsistent dimensions instead of corrupting sums") {
    val bad = Seq((1L, "a", Array(1, 2, 3)), (2L, "a", Array(1, 2)))
      .toDF("vec_id", "label", "qv")
    val e = intercept[Exception] {
      Embeddings.groupCentroids(bad, "qv", "label").collect()
    }
    assert(e.getMessage.contains("inconsistent vector dimensions")
      || Option(e.getCause).exists(_.getMessage
        .contains("inconsistent vector dimensions")),
      s"unexpected error: $e")
  }

  test("quantizedDot approximates the exact dot within the int8 error bound") {
    val q = Embeddings.quantizeInt8(vecs, "embedding", "qv")
    val a = q.filter($"vec_id" === 1).select($"qv".as("qa"), $"qv_scale".as("sa"),
      Similarity.asDouble($"embedding").as("ea"))
    val b = q.filter($"vec_id" === 4).select($"qv".as("qb"), $"qv_scale".as("sb"),
      Similarity.asDouble($"embedding").as("eb"))
    val r = a.crossJoin(b).select(
      Embeddings.quantizedDot($"qa", $"sa", $"qb", $"sb").as("qdot"),
      Similarity.dot($"ea", $"eb").as("dot")).head
    // exact: dot = 127*-127 + 2*0.25 + -2*4 = -16136.5;
    // qdot = 127*-127 + 2*0 + -2*4 = -16137 (scales are exactly 1)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.5 + 1e-12,
      s"qdot=${r.getDouble(0)} dot=${r.getDouble(1)}")
  }

  test("quantize/normalize plan: narrow (no Exchange)") {
    val out = Embeddings.quantizeInt8(
      Embeddings.l2Normalize(vecs, "embedding", "nv"), "nv", "qv")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), "per-row ops must not shuffle:\n" + p)
  }

  test("reserved output columns are guarded") {
    intercept[IllegalArgumentException] {
      Embeddings.quantizeInt8(vecs.withColumn("qv", lit(1)), "embedding", "qv")
    }
    intercept[IllegalArgumentException] {
      Embeddings.l2Normalize(vecs.withColumn("nv_norm", lit(1.0)), "embedding", "nv")
    }
  }

  test("centroidShift: identical sides read shift 0, a rotated label " +
    "reads shift 1, one-sided labels flag null with zero count") {
    val oldV = Seq(
      (1L, "keep", Array(127.0f, 0.0f)), (2L, "keep", Array(127.0f, 2.0f)),
      (3L, "rot", Array(127.0f, 0.0f)),
      (4L, "gone", Array(1.0f, 127.0f))).toDF("vec_id", "label", "embedding")
    val newV = Seq(
      (1L, "keep", Array(127.0f, 0.0f)), (2L, "keep", Array(127.0f, 2.0f)),
      (3L, "rot", Array(0.0f, 127.0f)), // orthogonal re-embed
      (5L, "born", Array(5.0f, 127.0f))).toDF("vec_id", "label", "embedding")
    val out = Embeddings.centroidShift(oldV, newV, "embedding", "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(out("keep") == ((2L, 2L, Some(1.0), Some(0.0))))
    assert(out("rot") == ((1L, 1L, Some(0.0), Some(1.0))))
    // labels on one side only: undefined shift is NULL, never a fake 0
    assert(out("gone") == ((1L, 0L, None, None)))
    assert(out("born") == ((0L, 1L, None, None)))
  }
}
