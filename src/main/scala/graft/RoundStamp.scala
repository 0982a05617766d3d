package graft

/** Single source for the round number stamped on per-round artifacts
  * (`bench_full_r<N>.json`, `ACCURACY_r<N>.json`). Bench and Verify
  * previously derived it from their OWN driver artifact family
  * (`BENCH_r<N>` vs `CORRECTNESS_r<N>`), so a partial run (bench
  * without verify, or vice versa) could stamp the two files with
  * different rounds; deriving from the max over BOTH families keeps
  * them in step no matter which half ran. `SPARK_GRAFT_ROUND`
  * overrides. */
object RoundStamp {
  def round(repoDir: java.nio.file.Path): Int =
    sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
      val re = "(?:BENCH|CORRECTNESS)_r(\\d+)\\.json".r
      val prior = Option(repoDir.toFile.list()).getOrElse(Array.empty)
        .flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toInt))
      if (prior.isEmpty) 1 else prior.max + 1
    }
}
