package graft.config

import scala.io.Source
import graft.graph.HgnParams

/** Run configuration for the HGN CLI, mirroring the reference's YAML
  * sections (`configuration/yml_schema.json`: input / run_options /
  * output / spark) with the same keys and defaults
  * (`confs/quakers.yml:30-70`).
  *
  * Parsing: a deliberately small reader for the flat
  * `section.key: value` subset this engine needs (no external YAML jar
  * exists in the offline build environment). Two formats are accepted:
  * two-level indented YAML (section header line + indented `key: value`
  * pairs) and flat `section.key=value` properties. `!ENV ${VAR}`-style
  * environment interpolation is supported as `${VAR}` anywhere in a value
  * (`configuration/configuration.py:70-117`).
  */
final case class HgnConfig(
    nodesPath: String,
    edgesPath: String,
    featureNames: Seq[String],
    featuresToCheck: Seq[String],
    nodesDelimiter: String = ",",
    edgesDelimiter: String = ",",
    nodesEncoding: String = "UTF-8",
    nodesHasHeader: Boolean = true,
    edgesHasHeader: Boolean = true,
    edgesHaveWeights: Boolean = false,
    params: HgnParams = HgnParams(),
    outputDir: String = "output",
    saveCommunities: Boolean = true,
    cachedInitStep: Boolean = false,
    // S10: optional relational datastore (reference `datastore` YAML
    // section) — when present, the final communities table is also
    // written through the JDBC passthrough ([[graft.sources.JdbcStore]]).
    jdbc: Option[graft.sources.JdbcConfig] = None,
    jdbcCommunitiesTable: String = "communities",
    // Reference parity: the YAML `spark` section becomes SparkConf
    // entries (`spark_manager/spark_manager.py:79-84`). Honored only
    // where the ENGINE owns the session (the `Hgn` CLI) — under the
    // driver-owned Verify/Bench sessions it is ignored by design.
    sparkConf: Map[String, String] = Map.empty) {
  require(nodesPath.nonEmpty, "input.nodes_path is required")
  require(edgesPath.nonEmpty, "input.edges_path is required")
  require(featureNames.nonEmpty, "input.feature_names is required")
  require(featuresToCheck.forall(featureNames.contains),
    "run_options.features_to_check must be a subset of input.feature_names")
}

object HgnConfig {

  /** Parse the config text; see class docs for the accepted subset. */
  def parse(text: String): HgnConfig = {
    val kv = scala.collection.mutable.Map[String, String]()
    var section = ""
    for (raw <- text.linesIterator) {
      // YAML comment rules: '#' starts a comment only at line start or
      // after whitespace, so values containing '#' (paths, URLs) survive.
      val line = raw.replaceAll("(^|\\s)#.*$", "")
      if (line.trim.nonEmpty) {
        val indented = line.head == ' ' || line.head == '\t'
        val t = line.trim
        if (t.contains(":") || t.contains("=")) {
          // Separator = whichever of ':' / '=' appears FIRST, so a
          // properties-style `key=a:b` keeps its ':' inside the value.
          val ci = t.indexOf(':'); val ei = t.indexOf('=')
          val sep = if (ei < 0 || (ci >= 0 && ci < ei)) ":" else "="
          val Array(k, rest @ _*) = t.split(java.util.regex.Pattern.quote(sep), 2)
          val v = rest.headOption.getOrElse("").trim
          if (!indented && v.isEmpty) section = k.trim
          else {
            val key = if (indented && section.nonEmpty) s"$section.${k.trim}"
                      else k.trim
            kv(key) = interpolate(v)
          }
        }
      }
    }
    build(kv.toMap)
  }

  def fromFile(path: String): HgnConfig = {
    val src = Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }

  private def interpolate(v: String): String =
    "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(v,
      m => java.util.regex.Matcher.quoteReplacement(
        sys.env.getOrElse(m.group(1), "")))

  /** Every key the engine reads. Unknown keys are REJECTED with the full
    * list — the jsonschema-equivalent strictness of the reference's
    * config validation (`configuration/configuration.py:49`,
    * `yml_schema.json`): a typo like `max_sp_lenght` must fail loudly at
    * load, not silently run with the default. `tag` is accepted and
    * ignored; `spark.*` keys are collected into [[HgnConfig.sparkConf]]
    * and applied by the `Hgn` CLI's own session builder (ignored under
    * driver-owned sessions, which this engine does not configure).
    */
  private val KnownKeys: Set[String] = Set(
    "input.nodes_path", "input.edges_path", "input.feature_names",
    "input.nodes_delimiter", "input.edges_delimiter", "input.nodes_encoding",
    "input.nodes_has_header", "input.edges_has_header", "input.edges_have_weights",
    "run_options.features_to_check", "run_options.feature_min_avg",
    "run_options.r_lvl1_thres", "run_options.r_lvl2_thres",
    "run_options.max_edge_weight", "run_options.betweenness_thres",
    "run_options.max_sp_length", "run_options.max_steps",
    "run_options.min_comp_size", "run_options.max_mid_degree",
    "run_options.cached_init_step", "run_options.split_two_hop",
    "output.dir", "output.save_communities_to_csvs",
    "datastore.url", "datastore.username", "datastore.password",
    "datastore.driver", "datastore.communities_table",
    "datastore.hostname", "datastore.db_name", "datastore.port")

  private def build(kv: Map[String, String]): HgnConfig = {
    val unknown = kv.keys
      .filterNot(k => KnownKeys(k) || k == "tag" || k.startsWith("spark."))
      .toSeq.sorted
    require(unknown.isEmpty,
      s"unknown config key(s): ${unknown.mkString(", ")} — known keys: " +
        KnownKeys.toSeq.sorted.mkString(", "))
    // Strip one layer of matching quotes: delimiters like '|' or ' '
    // must be quotable or they'd be lost to trimming / YAML syntax.
    def unquote(v: String): String =
      if (v.length >= 2 &&
          (v.head == '\'' || v.head == '"') && v.last == v.head)
        v.substring(1, v.length - 1)
      else v
    def str(k: String, dflt: String = ""): String =
      kv.get(k).map(unquote).getOrElse(dflt)
    def bool(k: String, dflt: Boolean): Boolean =
      kv.get(k).map(_.toLowerCase == "true").getOrElse(dflt)
    def dbl(k: String, dflt: Double): Double = kv.get(k).map(_.toDouble).getOrElse(dflt)
    def int(k: String, dflt: Int): Int = kv.get(k).map(_.toInt).getOrElse(dflt)
    def list(k: String): Seq[String] =
      kv.get(k).map(_.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

    val features = list("input.feature_names")
    val toCheck = list("run_options.features_to_check") match {
      case Nil => features
      case s => s
    }
    HgnConfig(
      nodesPath = str("input.nodes_path"),
      edgesPath = str("input.edges_path"),
      featureNames = features,
      featuresToCheck = toCheck,
      nodesDelimiter = str("input.nodes_delimiter", ","),
      edgesDelimiter = str("input.edges_delimiter", ","),
      nodesEncoding = str("input.nodes_encoding", "UTF-8"),
      nodesHasHeader = bool("input.nodes_has_header", dflt = true),
      edgesHasHeader = bool("input.edges_has_header", dflt = true),
      edgesHaveWeights = bool("input.edges_have_weights", dflt = false),
      params = HgnParams(
        featureMinAvg = dbl("run_options.feature_min_avg", 0.33),
        rLvl1Thres = dbl("run_options.r_lvl1_thres", 0.50),
        rLvl2Thres = dbl("run_options.r_lvl2_thres", 0.85),
        maxEdgeWeight = dbl("run_options.max_edge_weight", 0.50),
        betweennessThres = dbl("run_options.betweenness_thres", 10.0),
        maxSpLength = int("run_options.max_sp_length", 2),
        maxSteps = int("run_options.max_steps", 30),
        minCompSize = int("run_options.min_comp_size", 10),
        maxMidDegree = kv.get("run_options.max_mid_degree").map(_.toLong),
        // 2-hop/r-metric chain splitter for large iterative runs
        // (RMetrics.run splitTwoHop — round-16 step-1 experiment knob).
        splitTwoHop = bool("run_options.split_two_hop", dflt = false)),
      outputDir = str("output.dir", "output"),
      saveCommunities = bool("output.save_communities_to_csvs", dflt = true),
      cachedInitStep = bool("run_options.cached_init_step", dflt = false),
      // Either a full JDBC url, or the reference's mysql host/db/port
      // triple (`configuration/yml_schema.json` datastore section).
      jdbc = kv.get("datastore.url").map(u =>
        graft.sources.JdbcConfig(unquote(u), str("datastore.username"),
          str("datastore.password"), kv.get("datastore.driver").map(unquote)))
        .orElse(kv.get("datastore.hostname").map(h =>
          graft.sources.JdbcConfig(
            s"jdbc:mysql://${unquote(h)}:${int("datastore.port", 3306)}/" +
              str("datastore.db_name"),
            str("datastore.username"), str("datastore.password")))),
      jdbcCommunitiesTable = str("datastore.communities_table", "communities"),
      sparkConf = kv.collect {
        // Keys inside a `spark:` section carry the section prefix on top
        // of their own `spark.` name (reference confs spell the full
        // Spark key, e.g. `spark:\n  spark.executor.memory: 4g`).
        case (k, v) if k.startsWith("spark.") =>
          (if (k.startsWith("spark.spark.")) k.stripPrefix("spark.") else k) ->
            unquote(v)
      })
  }
}
