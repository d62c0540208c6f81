package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic seeded text embedder (reference:
  * src/vector_search/embeddings/text_embeddings.py:56-87
  * `_generate_mock_embeddings` — the reference's own model-free path seeds a
  * PRNG from a hash of the text and L2-normalizes the vector).
  *
  * numpy's Mersenne-Twister stream is not reproducible in SQL engines, so
  * the same contract (text-hash-seeded pseudo-random components, unit norm)
  * is re-derived from md5: component i = (first 32 bits of md5(text·"|"·i))
  * mod 2001 - 1000, an integer in [-1000, 1000]. Integer components make
  * the squared norm exact (≤ dim·10⁶ ≪ 2^53), so normalization is one
  * correctly-rounded IEEE sqrt + divide — bit-identical across engines.
  *
  * Everything is built from codegen'd built-ins (md5/conv/transform/
  * aggregate) — no UDF, embarrassingly parallel, zero shuffles: at 100 TB
  * embedding generation runs at scan speed.
  */
object Embeddings {

  /** Default embedding dimensionality (kept small: the synthetic corpus'
    * pre-built `embeddings` table carries the production-width vectors; this
    * embedder exists to make text→vector→ANN run end-to-end). */
  val Dim = 16

  /** Integer components in [-1000, 1000]: v_i = hex32(md5(text·"|"·i)) mod
    * 2001 - 1000. Returns array<long> of length `dim`. One fused codegen'd
    * pass (graft.functions.EmbedComponents — the declarative
    * conv(substring(md5(concat(…))),16,10) form builds `dim` separate hash
    * trees and round-trips hex strings; EmbedComponentsSpec pins the two
    * forms equal). */
  def rawComponents(text: Column, dim: Int = Dim): Column =
    graft.functions.EmbedComponents.of(text, dim)

  /** The declarative reference form of rawComponents — the spec the fused
    * expression is tested against (and the shape the DuckDB oracle mirrors). */
  def rawComponentsReference(text: Column, dim: Int = Dim): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      conv(substring(md5(concat(text, lit("|"), i.cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2001 - 1000)

  /** L2-normalized float embedding (array<float>) — drop-in for the
    * `embedding` column the ANN operators consume. All-zero components (a
    * 2^-160 accident) map to the zero vector instead of NaN. */
  def embedding(text: Column, dim: Int = Dim): Column = {
    val v = rawComponents(text, dim)
    // norm² is an exact integer; recomputed per element inside the lambda
    // but codegen CSEs the subtree, and correctness never depends on it
    val n2 = aggregate(v, lit(0L), (a, x) => a + x * x)
    transform(v, x =>
      when(n2 === 0L, lit(0.0f))
        .otherwise((x.cast("double") / sqrt(n2.cast("double"))).cast("float")))
  }
}
