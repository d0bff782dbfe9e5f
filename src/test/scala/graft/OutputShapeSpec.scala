package graft

/** The driver-hashable output contract, enforced locally: every registered
  * query must emit ATOMIC top-level columns only (no array/map/struct).
  *
  * Why: the driver canonicalizes each verify parquet with a pandas
  * `sort_values` before hashing, and pandas cannot sort a nested cell —
  * round 5's ONLY driver-red row (ss29_rp_encode, then a `list<int64>`
  * column) crashed the harness with `TypeError: unhashable type:
  * 'numpy.ndarray'` despite a correct answer. The local `check.py` gate
  * canonicalizes via `repr`, which happily accepts lists — i.e. the local
  * gate is WEAKER than the driver's on exactly this axis — so the shape
  * contract has to be a compile-and-test-time fact here, not a driver
  * discovery. Queries needing a vector-valued result emit long form
  * (id, pos, value) instead, as ss29 now does.
  */
class OutputShapeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  // NOTE on cost: lazily-planned queries resolve .schema without running;
  // the handful of EAGER constructors (index builds, fixpoint loops)
  // self-execute at sf0.001 — a deliberate price for enforcing the
  // contract at test time, on top of the Verify-side gate (both sites
  // share Verify.nonAtomicFields so the rule cannot drift).
  test("every registered query emits atomic-only top-level columns") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        Verify.nonAtomicFields(fn(spark, sfDir).schema)
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"nested top-level columns break the driver's pandas hasher " +
        s"(see ss29 round-5 incident); emit long form instead: " +
        offenders.mkString("; "))
  }
}
