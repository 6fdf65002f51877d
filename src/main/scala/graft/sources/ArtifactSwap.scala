package graft.sources

import org.apache.spark.sql.SparkSession

/** Atomic REFRESH of a meta.json-sidecar'd model-artifact directory —
  * the [[graft.operators.Similarity.refitIvfPqIndex]] stage-and-swap
  * discipline factored out for the single-directory artifact families
  * (TextClassifier, NgramLm, Dsir, BpeTokenizer all persist as one
  * parquet payload + a job-free meta.json, and some add a `_drift.json`
  * baseline). Re-saving a refit model IN PLACE over a live serving path
  * is the torn-window hazard JsonSidecar.write closed for single files,
  * writ large: a crash mid-save leaves a directory every loader refuses
  * on. Here the new artifact fully materializes BESIDE the live one
  * (`$path.swap_tmp`), then two atomic directory renames — live →
  * `$path.swap_old`, staged → live — swap it in, and the old artifact is
  * deleted last. A reader in any window loads the OLD artifact
  * (consistent), the NEW one (consistent), or fails loudly on the absent
  * path in the instant between the renames — never a torn mix, because
  * payload and sidecars move together with their directory.
  *
  * `witness` names the staging's completeness marker — the file the
  * caller's `write` callback writes LAST (meta.json for plain saves;
  * `_drift.json` when the callback also writes a drift baseline, so a
  * staging that crashed between the two sidecars is never promoted).
  * Crash recovery at entry: an absent live path rolls FORWARD from a
  * witness-complete staging (deleting any `.swap_old` leftover) or BACK
  * from `.swap_old`, whichever survived — then the refresh proceeds.
  * First-time publishes (no live artifact yet) stage and rename in the
  * same way, so even the initial save is all-or-nothing. SINGLE-
  * MAINTAINER contract (the refit/compaction house rule): run from the
  * serialized maintenance loop that owns the artifact's lifecycle.
  */
private[graft] object ArtifactSwap {

  def refresh(spark: SparkSession, path: String,
              witness: String = "meta.json")(write: String => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$path.swap_tmp")
    val old = new org.apache.hadoop.fs.Path(s"$path.swap_old")
    def complete(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p, witness))
    // crash recovery for the between-renames window (live renamed out,
    // staging not yet renamed in): roll FORWARD from a witness-complete
    // staging, else roll BACK the old artifact — a live artifact exists
    // again before this refresh proceeds
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "meta.json"))) {
      // this recovery only handles ArtifactSwap's OWN crash windows, and
      // those always leave the live path ABSENT (the swap-out rename is
      // atomic). A root that EXISTS without meta.json is torn some other
      // way (e.g. a legacy in-place save) — renaming onto an existing
      // directory would nest the staging/.swap_old INSIDE it (Hadoop
      // rename semantics) and, in the roll-back branch, bury then delete
      // the only good copy. Refuse loudly instead of guessing.
      require(!fs.exists(root),
        s"refusing to refresh $root: directory exists but has no meta.json " +
          "(torn by something other than an ArtifactSwap crash) — inspect " +
          "and remove it before retrying")
      if (complete(staging)) {
        require(fs.rename(staging, root),
          s"crash recovery: roll-forward rename of $staging failed")
        fs.delete(old, true)
      } else if (fs.exists(new org.apache.hadoop.fs.Path(old, "meta.json"))) {
        require(fs.rename(old, root),
          s"crash recovery: roll-back rename of $old failed")
        fs.delete(staging, true)
      }
    }
    fs.delete(staging, true)
    write(staging.toString)
    require(complete(staging),
      s"staged artifact at $staging is missing its completeness witness " +
        s"$witness — the write callback must end with it")
    fs.delete(old, true)
    if (fs.exists(root))
      require(fs.rename(root, old), s"swap-out rename of $root failed")
    require(fs.rename(staging, root), s"swap-in rename into $root failed — " +
      s"the previous artifact is preserved at $old")
    fs.delete(old, true)
  }
}
