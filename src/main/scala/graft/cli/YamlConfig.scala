package graft.cli

import scala.collection.mutable

/** Config-file support — the reference's primary UX
  * (`/root/reference/config/config.go:29-66` + `config.yaml`): a YAML file
  * with `source`/`destination` connection blocks and the copy flags.
  *
  * The environment pins the dependency set (no YAML library), so this is a
  * minimal parser for exactly the reference file's shape: two levels of
  * `key: value`, full-line comments, quoted or bare scalars. It flattens to
  * dotted keys (`source.table`, `worker_pool.num_workers`, `check_hashes`).
  *
  * File-backed endpoints use `path:` (parquet root dir) where a ClickHouse
  * endpoint uses host/database; both vocabularies are accepted so the
  * reference's own config.yaml loads unchanged (its `database:` becomes the
  * path for the fixture layout when no host is given).
  */
object YamlConfig {

  /** One side's endpoint — the reference `Connection`
    * (`/root/reference/config/config.go:11-22`). */
  final case class Endpoint(
      path: String = "",
      table: String = "",
      host: String = "",
      port: Int = 9000,
      user: String = "default",
      password: String = "",
      database: String = "",
      secure: Boolean = false,
      skipVerify: Boolean = false,
      keyFilename: String = "") {
    /** Parquet root for the file engine: explicit `path`, else `database`
      * doubling as a directory (host-less configs). */
    def dir: String = if (path.nonEmpty) path else database
    def isJdbc: Boolean = host.nonEmpty
  }

  /** The full config (`/root/reference/config/config.go:29-38`).
    * `numWorkers` (`worker_pool.num_workers`, config.go:23-27 — dead code
    * in the reference, its README marks it broken) is WIRED here: >1 runs
    * repairs as that many concurrent per-partition Spark jobs
    * ([[graft.recon.Reconciler.Config.parallelism]]); default 0 keeps the
    * fused single-job repair. `worker_pool.num_retry`/`chan_len`
    * (config.go:23-27) dissolve into Spark's `spark.task.maxFailures` and
    * scheduler queueing — there is no client-side channel to size. */
  final case class GraftConfig(
      source: Endpoint = Endpoint(),
      destination: Endpoint = Endpoint(),
      partitionKey: String = "",
      checkHashes: Boolean = true,
      skipDelete: Boolean = false,
      skipReimport: Boolean = false,
      useVirtualColumn: Boolean = false,
      debug: Boolean = false,
      numWorkers: Int = 0)

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  /** Flatten the two-level YAML subset to dotted keys. Unknown keys are
    * kept (callers ignore them), malformed lines skipped. */
  def parse(text: String): Map[String, String] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    var section = ""
    text.linesIterator.foreach { raw =>
      val trimmed = raw.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        val indented = raw.startsWith(" ") || raw.startsWith("\t")
        trimmed.split(":", 2) match {
          case Array(k, v) =>
            val key = k.trim
            val value = stripQuotes(v.trim)
            if (!indented) {
              if (value.isEmpty) section = key
              else { section = ""; out(key) = value }
            } else if (section.nonEmpty) out(s"$section.$key") = value
            else out(key) = value
          case _ => ()
        }
      }
    }
    out.toMap
  }

  // lenient like the reference's own config.yaml (which contains `fasle`):
  // anything but the literal true is false
  private def bool(kv: Map[String, String], key: String, dflt: Boolean): Boolean =
    kv.get(key).map(_ == "true").getOrElse(dflt)

  private def endpoint(kv: Map[String, String], prefix: String): Endpoint =
    Endpoint(
      path = kv.getOrElse(s"$prefix.path", ""),
      table = kv.getOrElse(s"$prefix.table", ""),
      host = kv.getOrElse(s"$prefix.host", ""),
      port = kv.get(s"$prefix.port").flatMap(_.toIntOption).getOrElse(9000),
      user = kv.getOrElse(s"$prefix.user", "default"),
      password = kv.getOrElse(s"$prefix.password", ""),
      database = kv.getOrElse(s"$prefix.database", ""),
      secure = bool(kv, s"$prefix.secure", dflt = false),
      skipVerify = bool(kv, s"$prefix.skip_verify", dflt = false),
      keyFilename = kv.getOrElse(s"$prefix.key_filename", ""))

  def fromText(text: String): GraftConfig = {
    val kv = parse(text)
    GraftConfig(
      source = endpoint(kv, "source"),
      destination = endpoint(kv, "destination"),
      partitionKey = kv.getOrElse("partition_key", ""),
      checkHashes = bool(kv, "check_hashes", dflt = true),
      skipDelete = bool(kv, "skip_delete", dflt = false),
      skipReimport = bool(kv, "skip_reimport", dflt = false),
      useVirtualColumn = bool(kv, "use_virtual_column", dflt = false),
      debug = bool(kv, "debug", dflt = false),
      numWorkers = kv.get("worker_pool.num_workers").flatMap(_.toIntOption).getOrElse(0))
  }

  def load(path: String): GraftConfig =
    fromText(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** `config.Check()` (`/root/reference/config/config.go:66-71`): both
    * endpoints must name a table and a location. */
  def check(cfg: GraftConfig): Either[String, GraftConfig] = {
    def side(name: String, e: Endpoint): Option[String] =
      if (e.table.isEmpty) Some(s"$name.table is required")
      else if (e.dir.isEmpty && !e.isJdbc) Some(s"$name needs path/database or host")
      else None
    side("source", cfg.source).orElse(side("destination", cfg.destination))
      .toLeft(cfg)
  }
}
