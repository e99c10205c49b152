package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.{CrawlDelayRow, RobotsRuleRow}

/** F7/J5/W2 — robots.txt parsing and admission.
  *
  * Parse + precedence semantics transcribed from the reference
  * (`src/crawler/robots.py:36-95`): only the `User-agent: *` section is
  * honored; lines are lowercased wholesale; longest matching rule wins;
  * Allow wins a length tie (RFC 9309 §2.2.2); no match → allowed.
  *
  * Two Spark implementations are provided:
  *  1. [[Robots.allowedUdf]] — broadcast rule-map probe (rules are tiny and
  *     host-scoped; this is the chosen plan per SURVEY §2.2 F7).
  *  2. [[Robots.admitJoin]] — pure-DataFrame startswith-join + window argmax
  *     (J5/W2 shape), for when the rule set itself is large.
  */
object Robots {

  /** Parsed per-host policy. `sitemaps`: URLs advertised via `Sitemap:`
    * directives (section-independent, original case — reference
    * `discovery.py:487-497`), feeding the sitemap cascade's root list. */
  final case class Policy(
      disallowed: Vector[String],
      allowed: Vector[String],
      crawlDelaySec: Option[Double],
      sitemaps: Vector[String] = Vector.empty)

  val Empty: Policy = Policy(Vector.empty, Vector.empty, None)

  /** Transcription of `RobotsParser._parse` (`robots.py:36-59`) plus the
    * `Sitemap:` directive collection (`discovery.py:487-497`, which scans
    * the raw lines case-insensitively outside any user-agent section). */
  def parse(content: String): Policy = {
    var inAll = false
    var dis = Vector.empty[String]
    var all = Vector.empty[String]
    var delay: Option[Double] = None
    var maps = Vector.empty[String]
    content.linesIterator.foreach { raw =>
      val line = raw.trim.toLowerCase(java.util.Locale.ROOT)
      // untrimmed check + original-case value, exactly discovery.py:492-494
      if (raw.toLowerCase(java.util.Locale.ROOT).startsWith("sitemap:")) {
        val v = raw.split(":", 2)(1).trim
        if (v.nonEmpty) maps :+= v
      }
      if (line.startsWith("user-agent:")) {
        inAll = line.split(":", 2)(1).trim == "*"
      } else if (inAll) {
        if (line.startsWith("disallow:")) {
          val p = line.split(":", 2)(1).trim
          if (p.nonEmpty) dis :+= p
        } else if (line.startsWith("allow:")) {
          val p = line.split(":", 2)(1).trim
          if (p.nonEmpty) all :+= p
        } else if (line.startsWith("crawl-delay:")) {
          try delay = Some(line.split(":", 2)(1).trim.toDouble)
          catch { case _: NumberFormatException => }
        }
      }
    }
    Policy(dis, all, delay, maps)
  }

  /** Transcription of `RobotsParser.is_allowed` (`robots.py:61-95`),
    * given an already-extracted URL path. */
  def isAllowed(policy: Policy, path: String): Boolean = {
    var bestDis = -1
    policy.disallowed.foreach { r => if (path.startsWith(r) && r.length > bestDis) bestDis = r.length }
    var bestAll = -1
    policy.allowed.foreach { r => if (path.startsWith(r) && r.length > bestAll) bestAll = r.length }
    if (bestDis < 0 && bestAll < 0) true
    else if (bestDis < 0) true
    else if (bestAll < 0) false
    else bestAll >= bestDis
  }

  /** Broadcast the per-host policy map once per crawl (rules ≪ frontier). */
  def broadcastPolicies(spark: SparkSession, policies: Map[String, Policy]): Broadcast[Map[String, Policy]] =
    spark.sparkContext.broadcast(policies)

  /** Admission predicate as a UDF over a broadcast policy map: hosts without
    * robots.txt are fully allowed (reference: failed load → no filtering,
    * `robots.py:19-34`, `runner.py:297-309`). */
  def allowedUdf(bc: Broadcast[Map[String, Policy]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (host: String, path: String) =>
      bc.value.get(host) match {
        case Some(p) => isAllowed(p, path)
        case None    => true
      }
    }

  /** Policies → rule rows for the join-based plan / table persistence. */
  def toRuleRows(policies: Map[String, Policy]): (Seq[RobotsRuleRow], Seq[CrawlDelayRow]) = {
    val rules = policies.toSeq.sortBy(_._1).flatMap { case (host, p) =>
      p.disallowed.map(r => RobotsRuleRow(host, "disallow", r, r.length)) ++
        p.allowed.map(r => RobotsRuleRow(host, "allow", r, r.length))
    }
    val delays = policies.toSeq.sortBy(_._1).collect {
      case (host, p) if p.crawlDelaySec.isDefined => CrawlDelayRow(host, p.crawlDelaySec.get)
    }
    (rules, delays)
  }

  /** J5/W2 — join-based admission for large rule sets: broadcast theta-join
    * on `startswith(path, prefix)`, per-URL argmax on prefixLen with
    * Allow-≥-Disallow tie-break, left rows with no match admitted.
    *
    * Input df must carry `host` and `path` columns; returns df filtered to
    * admitted rows (original columns preserved).
    */
  def admitJoin(df: DataFrame, rules: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // no broadcast hint: this is the LARGE-rule-set path, and rules are
    // O(hosts × rules-per-host) — forcing a broadcast would OOM the driver
    // at 10^8 hosts. The join has an equi-key (host) with startswith as the
    // residual condition, so a shuffle join distributes fine; AQE still
    // broadcasts small rule sets on its own.
    val r = rules.select(
      $"host".as("r_host"), $"kind", $"pathPrefix", $"prefixLen")
    // aggregate on the NATURAL key (host, path) — a synthetic row id would
    // force a full shuffle of the frontier on a key that exists only for
    // the aggregation; duplicate (host, path) rows share one decision
    val keys = df.select($"host", $"path").distinct()
    val joined = keys.join(r,
      keys("host") === r("r_host") && keys("path").startsWith(r("pathPrefix")),
      "left_outer")
    // per URL: max prefixLen per kind; allowed iff no disallow match, or
    // best allow >= best disallow
    val admittedKeys = joined.groupBy(keys("host"), keys("path"))
      .agg(
        max(when($"kind" === "disallow", $"prefixLen")).as("bestDis"),
        max(when($"kind" === "allow", $"prefixLen")).as("bestAll"))
      .where($"bestDis".isNull || ($"bestAll".isNotNull && $"bestAll" >= $"bestDis"))
      .select($"host", $"path")
    df.join(admittedKeys, Seq("host", "path"), "left_semi")
  }
}
