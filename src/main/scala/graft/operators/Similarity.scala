package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * q27 — brute-force cosine top-k: the correctness baseline. Query vectors
  *   (vec_id % 100 == 0) are broadcast; each partition of the base table
  *   scores its rows against all queries (no shuffle of the base table,
  *   work O(n_base * n_query)), then a per-query top-k window.
  *   All arithmetic is double precision, and the DuckDB oracle uses the
  *   structurally identical expression so ranks agree.
  *
  * q28 — sign-bit LSH bucketed ANN: the scale path. Vectors land in a
  *   2^12 bucket keyed by the sign bits of their first 12 dimensions;
  *   a query only scores vectors in its own bucket. Approximate by
  *   construction → rows-only check (no SQL twin).
  *
  * Scale notes (100 TB): brute force distributes perfectly but costs
  * O(n*q); the LSH variant cuts candidates ~4000x with a single
  * bucket-equality shuffle join, which is the pattern an IVF index would
  * use (bucket id = coarse centroid id instead of sign bits).
  */
object Similarity {

  private val dotExpr = "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
  private val norm2Expr = "aggregate(v, 0D, (acc, x) -> acc + x * x)"

  val queries: Map[String, Q] = Map(
    // ---- q27: brute-force cosine top-10 per query vector ----
    "q27_knn_cosine" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(expr(norm2Expr)))
      val q = e.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      e.join(broadcast(q), $"vec_id" =!= $"qid")
        .withColumn("sim", expr(dotExpr) / ($"nrm" * $"qn"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter($"rnk" <= 10)
        .select($"qid", $"rnk", $"vec_id".as("nid"), round($"sim", 4).as("sim_r"))
        .orderBy($"qid", $"rnk")
    }),

    // ---- q28: LSH-bucketed approximate top-5 (rows-only check) ----
    "q28_ann_lsh_bucketed" -> ((s, dir) => {
      import s.implicits._
      // bucket = sign bits of dims 0..5 (a fixed, data-independent LSH;
      // for IVF swap in coarse-quantizer centroid ids). 64 buckets keeps
      // candidate lists non-trivial at the test scales; at 100 TB the bit
      // count (or IVF nlist) grows with corpus size.
      val bucketExpr = (0 until 6).map { j =>
        when(expr(s"v[$j]") > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val e = t(s, dir, "embeddings")
        .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(expr(norm2Expr)))
        .withColumn("bucket", bucketExpr)
      val q = e.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"), $"bucket".as("qbucket"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      e.join(broadcast(q), $"bucket" === $"qbucket" && $"vec_id" =!= $"qid")
        .withColumn("sim", expr(dotExpr) / ($"nrm" * $"qn"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk", $"vec_id".as("nid"), round($"sim", 4).as("sim_r"))
        .orderBy($"qid", $"rnk")
    })
  )

  val oracle: Map[String, String] = Map(
    "q27_knn_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
        |     scored AS (
        |       SELECT q.qid, e.vec_id AS nid,
        |         list_dot_product(e.v, q.qv) /
        |           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        |       FROM e, q WHERE e.vec_id <> q.qid),
        |     ranked AS (
        |       SELECT qid, nid, sim,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |       FROM scored)
        |SELECT qid, rnk, nid, round(sim, 4) AS sim_r
        |FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  )
}
