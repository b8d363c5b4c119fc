package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class IvfSpec extends AnyFunSuite {
  import TestSpark._

  test("ivf search: deterministic, k results per query, decent recall vs brute force") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val ivf = Similarity.ivfSearch(emb, queries, "embedding", "vec_id",
      k = 10, nlist = 16, nprobe = 6)
    val rows = ivf.collect()
    // every query returns up to k ranked neighbors
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty && byQ.values.forall(_.length <= 10))
    // deterministic across runs
    val again = Similarity.ivfSearch(emb, queries, "embedding", "vec_id",
      k = 10, nlist = 16, nprobe = 6).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // recall vs the exact brute-force top-10 (q27 logic)
    val exact = graft.operators.Similarity.queries("q27_knn_cosine")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
  }

  test("ivf search: base smaller than nlist clamps centroid count") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
    val out = Similarity.ivfSearch(emb, emb.limit(1), "embedding", "vec_id",
      k = 3, nlist = 16, nprobe = 4).collect()
    assert(out.length <= 3) // runs without AIOOBE; query matched against the 4 others
  }
}
