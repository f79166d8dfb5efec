package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sign random projection — dimensionality reduction for the embedding
  * column: project d-dim vectors onto `dOut` ±1 directions (Achlioptas,
  * "Database-friendly random projections", JPDC 2003 — the sparse/sign
  * family whose JL-style distance preservation needs no Gaussian draws),
  * with the sign matrix derived from the engine-portable Knuth
  * multiplicative hash ([[graft.operators.Curation.idHash]]'s constant) so
  * the projection is a pure deterministic FORMULA: no RNG state, no model
  * artifact to ship — any engine, any rerun, any partitioning produces
  * bit-identical projections (the q141 oracle replays them exactly: every
  * output coordinate is a fixed-order fold of ±(float-exact) doubles, so
  * even the float hash compares clean).
  *
  * Where it sits in the pipeline: in front of the quadratic/shuffle-heavy
  * embedding operators. A 64→16 projection shrinks every downstream
  * exchange (LSH signatures, SemDeDup cluster assignment, brute-force
  * re-rank blocks) 4×, at a measured recall cost the companion spec
  * quantifies against full-dimension truth. The reference has no
  * dimensionality-reduction surface; the published recipe above is the
  * attribution.
  *
  * Scale shape: the sign matrix is a driver-built literal (dOut×dIn
  * doubles — KBs), the projection is a per-row map with ZERO shuffle and
  * zero state. The higher-order-function form below is interpreted (not
  * codegen'd) Catalyst — fine for a column produced once and persisted;
  * wrap hot inner loops in a native Expression only if a profile demands
  * it (the [[graft.functions]] escalation rule).
  */
object RandomProjection {

  /** The ±1 matrix entry for output dim `j`, input dim `i` (0-based):
    * sign from the TOP bit of Knuth((j*dIn + i + seed)) — computed in
    * exact long arithmetic INSIDE the 2^32 domain, replayable in any
    * BIGINT engine as
    * `((j*dIn+i+seed) * 2654435761) % 4294967296 < 2147483648`.
    *
    * The top bit, NOT `% 2`: a multiplicative hash's low bit is the
    * input's own parity (the multiplier is odd), which for even `dIn`
    * makes every row the SAME alternating pattern — a rank-1 matrix that
    * projects onto one direction 16 times (caught by the cluster-purity
    * spec at 0.19 vs 1.00). High multiplicative-hash bits mix; low bits
    * are the textbook trap.
    */
  def signAt(j: Int, i: Int, dIn: Int, seed: Long): Double = {
    val x = j.toLong * dIn + i + seed
    // driver-side only, so BigInt dodges the long overflow the operator-
    // side idHash handles with its 16-bit split; for x < ~3.47e9 the
    // naive one-multiply BIGINT formula in the oracle agrees (q42 caveat)
    val h = ((BigInt(java.lang.Math.floorMod(x, 4294967296L)) * 2654435761L)
      mod BigInt(4294967296L)).toLong
    if (h < 2147483648L) 1.0 else -1.0
  }

  /** The full dOut × dIn sign matrix (driver-side literal). */
  def signMatrix(dOut: Int, dIn: Int, seed: Long = 0L): Seq[Seq[Double]] =
    (0 until dOut).map(j => (0 until dIn).map(i => signAt(j, i, dIn, seed)))

  /** Project `vecCol` (ARRAY<FLOAT>/ARRAY<DOUBLE>, length `dIn`) to
    * ARRAY<DOUBLE> of length `dOut`: out[j] = Σ_i sign(j,i) * v[i], folded
    * in ascending i from a 0.0 seed (the fixed association the oracle
    * mirrors). Rows whose vector length differs from `dIn` fail the job
    * loudly (the [[graft.sources.VectorStoreCatalog.addVectors]] shape
    * discipline) rather than projecting garbage.
    *
    * Output: (idCol, proj). Unit-norm inputs stay roughly √(dIn/dOut)
    * in norm — rescale by 1/√dOut downstream if calibrated magnitudes
    * matter; similarity RANKS (what the ANN layer consumes) are
    * scale-invariant.
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dIn: Int,
      dOut: Int,
      seed: Long = 0L): DataFrame = {
    require(dIn >= 1 && dOut >= 1 && dOut <= dIn,
      s"need 1 <= dOut <= dIn, got dIn=$dIn dOut=$dOut")
    val m = typedLit(signMatrix(dOut, dIn, seed))
    val checked = when(size(col(vecCol)) === dIn, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"random projection expects dim $dIn, got "),
        size(col(vecCol)).cast("string"))))
    df.select(col(idCol), checked.as("_v"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dOut - 1)), j =>
          aggregate(sequence(lit(1), lit(dIn)), lit(0.0), (acc, i) =>
            acc + element_at(element_at(m, j + lit(1)), i) *
              element_at(col("_v"), i).cast("double"))).as("proj"))
  }
}
