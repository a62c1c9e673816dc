package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation — the crawl-compliance gate (RFC 9309, the
  * Robots Exclusion Protocol): given a robots.txt body, a user-agent
  * product token, and a URL path, decide whether fetching is allowed.
  * A corpus pipeline needs this both for POLICY (respect exclusions at
  * recrawl/refresh time) and for AUDIT (flag already-crawled documents
  * whose current robots.txt excludes them — the takedown sweep).
  *
  * Semantics implemented (RFC 9309 + the de-facto Google rules):
  *   - groups = consecutive `User-agent:` lines followed by rules; ALL
  *     groups naming the matched agent merge. A group matches when its
  *     agent token equals the product token case-insensitively; if none
  *     match, the `*` groups apply; no groups at all → allow.
  *   - patterns are literal except `*` (any char sequence) and a
  *     trailing `$` (end anchor); matching is case-sensitive on paths,
  *     case-insensitive on field names.
  *   - precedence: the LONGEST (most specific) matching pattern wins;
  *     Allow wins a length tie. An empty `Disallow:` allows everything.
  *     Default is allow.
  *   - comments (`#` to end of line), blank lines, CR, and unknown
  *     fields (Crawl-delay, Sitemap) are ignored; damage never throws —
  *     robots.txt in the wild is ungrammatical, and a parse error must
  *     not take down a compliance sweep.
  *
  * Pure per-row string walk — scan-stage, no libm, deterministic. */
object RobotsOps {

  private final case class Rule(allow: Boolean, pattern: String)

  /** `pattern` matches `path` with `*` wildcards and an optional
    * trailing `$` end anchor. Without the anchor the pattern matches a
    * PREFIX of the path (the robots rule semantics); with it, the whole
    * path. Split on stars: the first literal segment anchors at the
    * start, middle segments are found greedily in order (earliest match
    * is never worse for pure existence), and an anchored last segment
    * must align to the path's end. */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val p = if (anchored) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var idx = segs(0).length
    if (segs.length == 1) return !anchored || idx == path.length
    var i = 1
    while (i < segs.length - 1) {
      val s = segs(i)
      if (s.nonEmpty) {
        val at = path.indexOf(s, idx)
        if (at < 0) return false
        idx = at + s.length
      }
      i += 1
    }
    val last = segs(segs.length - 1)
    if (!anchored) {
      last.isEmpty || path.indexOf(last, idx) >= 0
    } else {
      if (last.isEmpty) true // "...*$": the star absorbs the tail
      else path.length - last.length >= idx && path.endsWith(last)
    }
  }

  private def parse(robots: String, agent: String): Seq[Rule] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val wildcard = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var groupAgents: Set[String] = Set.empty
    var inAgentRun = false // consecutive User-agent lines extend the group
    robots.split('\n').foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.stripSuffix("\r").trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val field = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(ci + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgentRun) groupAgents = Set.empty
              inAgentRun = true
              groupAgents += value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inAgentRun = false
              val rule = Rule(field == "allow", value)
              if (groupAgents.contains(agentLc)) specific += rule
              else if (groupAgents.contains("*")) wildcard += rule
            case _ => inAgentRun = false // Crawl-delay, Sitemap, unknown
          }
        }
      }
    }
    val hasSpecificGroup = specific.nonEmpty || {
      // a specific group with no rules still overrides * (allows all)
      robots.split('\n').exists { raw =>
        val noComment = {
          val h = raw.indexOf('#')
          if (h >= 0) raw.substring(0, h) else raw
        }
        val l = noComment.stripSuffix("\r").trim.toLowerCase(java.util.Locale.ROOT)
        l.startsWith("user-agent:") && l.substring(11).trim == agentLc
      }
    }
    if (hasSpecificGroup) specific.toSeq else wildcard.toSeq
  }

  def allowed(robots: UTF8String, agent: UTF8String, path: UTF8String): Boolean = {
    val rules = parse(robots.toString, agent.toString)
    val pathS = path.toString
    var bestLen = -1
    var bestAllow = true // default allow
    rules.foreach { r =>
      // an empty Disallow:/Allow: value restricts nothing (RFC 9309)
      if (r.pattern.nonEmpty && patternMatches(r.pattern, pathS)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen && r.allow) bestAllow = true // Allow wins ties
      }
    }
    bestAllow
  }
}

case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "robots_allowed expects (robots_txt: string, agent: string, path: string)")

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsOps.allowed(r.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a, p) =>
      s"graft.functions.RobotsOps.allowed($r, $a, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RobotsAllowed =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "robots_allowed"
}

object RobotsKernels {
  def robotsAllowed(robots: Column, agent: Column, path: Column): Column =
    GraftColumnBridge.column(RobotsAllowed(
      GraftColumnBridge.expression(robots),
      GraftColumnBridge.expression(agent),
      GraftColumnBridge.expression(path)))
}
