package graft.kernel

import scala.collection.mutable

/** Minimal JSON value tree + parser (no external libs; JSON grammar is
  * public). Sufficient for the reference's JSON-LD shapes:
  * objects/arrays/strings/numbers/bools/null. */
sealed trait JVal
object JVal {
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def get(k: String): Option[JVal] = fields.find(_._1 == k).map(_._2)
  }
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JNum(raw: String) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal
}

object JsonParser {
  import JVal._

  def parse(s: String): Either[String, JVal] =
    try {
      val p = new P(s)
      val v = p.value()
      p.ws()
      if (p.pos < s.length) Left(s"trailing input at ${p.pos}") else Right(v)
    } catch { case e: Exception => Left(e.getMessage) }

  private final class P(s: String) {
    var pos = 0
    def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String) = throw new IllegalArgumentException(s"$msg at $pos")
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(): JVal = {
      ws()
      if (pos >= s.length) fail("eof")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => num()
      }
    }
    private def lit(l: String): Unit = {
      if (!s.startsWith(l, pos)) fail(s"expected $l")
      pos += l.length
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val b = Vector.newBuilder[(String, JVal)]
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(b.result()) }
      while (true) {
        ws()
        val k = str()
        ws(); expect(':')
        b += (k -> value())
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); return JObj(b.result()) }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[JVal]
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      while (true) {
        b += value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); return JArr(b.result()) }
      }
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case o => fail(s"bad escape $o")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }
    private def num(): JNum = {
      val start = pos
      while (pos < s.length && ("+-0123456789.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      if (pos == start) fail("expected value")
      JNum(s.substring(start, pos))
    }
  }
}

/** JSON-LD document operations: ingest (S3, types.rs:192-196),
  * selective normalization (P6, normalize.rs:98-142), triple flattening
  * (T4, integration_tests.rs:70-110 simple / docred_evaluation.rs:251-327
  * rich), and recursive name harvest (T5, extractor.rs:371-397). */
object JsonLd {
  import JVal._

  final case class FlatTriple(subject: String, predicate: String, objectValue: String)

  private def strOf(v: JVal): Option[String] = v match {
    case JStr(s) => Some(s)
    case JNum(r) => Some(r)
    case JBool(b) => Some(b.toString)
    case _ => None
  }

  /** Root-entity graphs: the document itself, or each member of @graph
    * (extractor.rs merge shape, merge_chunks extractor.rs:495-550). */
  private def rootEntities(doc: JVal): Vector[JObj] = doc match {
    case o: JObj =>
      o.get("@graph") match {
        case Some(JArr(items)) => items.collect { case e: JObj => e }
        case _ => Vector(o)
      }
    case JArr(items) => items.collect { case e: JObj => e }
    case _ => Vector.empty
  }

  /** T4 flattening with the reference conventions: subject =
    * slug(root name); predicate = Porter-stemmed key; object = nested
    * `name` verbatim, or the scalar verbatim; arrays contribute one
    * triple per element. Nested scalar properties become direct triples
    * of the nested entity (docred_evaluation.rs:302-320 rich variant
    * when `nestedProps` = true). @-keys and `name` itself are skipped. */
  def flatten(json: String, nestedProps: Boolean = false): Vector[FlatTriple] = {
    JsonParser.parse(json) match {
      case Left(_) => Vector.empty
      case Right(doc) =>
        rootEntities(doc).flatMap(e => flattenEntity(e, nestedProps))
    }
  }

  private def flattenEntity(e: JObj, nestedProps: Boolean): Vector[FlatTriple] = {
    val out = Vector.newBuilder[FlatTriple]
    val rootName = e.get("name").flatMap(strOf).getOrElse(return Vector.empty)
    val subj = Slug.slug(rootName)
    e.fields.foreach { case (key, value) =>
      if (!key.startsWith("@") && key != "name") {
        val pred = Porter.stemPredicate(key)
        def emit(v: JVal): Unit = v match {
          case o: JObj =>
            o.get("name").flatMap(strOf).foreach { n =>
              out += FlatTriple(subj, pred, n)
              if (nestedProps) {
                val nestedSubj = Slug.slug(n)
                o.fields.foreach { case (nk, nv) =>
                  if (!nk.startsWith("@") && nk != "name")
                    strOf(nv).foreach(s =>
                      out += FlatTriple(nestedSubj, Porter.stemPredicate(nk), s))
                }
              }
            }
          case JArr(items) => items.foreach(emit)
          case other => strOf(other).foreach(s => out += FlatTriple(subj, pred, s))
        }
        emit(value)
      }
    }
    out.result()
  }

  /** T5: every `name` in the tree, sorted + deduped
    * (extractor.rs:371-397). */
  def entityNames(json: String): Vector[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def walk(v: JVal): Unit = v match {
      case o: JObj =>
        o.get("name").flatMap(strOf).foreach(out += _)
        o.fields.foreach { case (_, fv) => walk(fv) }
      case JArr(items) => items.foreach(walk)
      case _ => ()
    }
    JsonParser.parse(json).foreach(walk)
    out.distinct.sorted.toVector
  }

  /** P3: carve the JSON document out of a free-form model reply
    * (extract_json_from_response, /root/reference/src/extractor.rs:164-183):
    * prefer a ```json fenced block; else the span from the first '{' to
    * the last '}'; None when neither exists. */
  def extractJsonFromResponse(response: String): Option[String] = {
    val fence = "```json"
    val fStart = response.indexOf(fence)
    if (fStart >= 0) {
      val bodyStart = fStart + fence.length
      val fEnd = response.indexOf("```", bodyStart)
      if (fEnd > bodyStart) return Some(response.substring(bodyStart, fEnd).trim)
    }
    val first = response.indexOf('{')
    val last = response.lastIndexOf('}')
    if (first >= 0 && last > first) Some(response.substring(first, last + 1))
    else None
  }

  // ---- T4⁻¹: JSON-LD document EMISSION (inverse of flatten) ----
  // The reference's native output is an RdfDocument: @context +
  // single-entity data, or @context + @graph[...] after merge_chunks
  // (/root/reference/src/types.rs:170-196, extractor.rs:495-550).

  /** Compact JSON serializer for JVal (insertion order preserved). */
  def render(v: JVal): String = {
    val sb = new StringBuilder
    def esc(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def walk(x: JVal): Unit = x match {
      case JObj(fields) =>
        sb.append('{')
        fields.zipWithIndex.foreach { case ((k, fv), i) =>
          if (i > 0) sb.append(',')
          esc(k); sb.append(':'); walk(fv)
        }
        sb.append('}')
      case JArr(items) =>
        sb.append('[')
        items.zipWithIndex.foreach { case (it, i) =>
          if (i > 0) sb.append(','); walk(it)
        }
        sb.append(']')
      case JStr(s) => esc(s)
      case JNum(r) => sb.append(r)
      case JBool(b) => sb.append(b)
      case JNull => sb.append("null")
    }
    walk(v)
    sb.toString
  }

  /** One JSON-LD entity object: @type, name, then properties in the
    * given order. Multi-valued properties become arrays (flatten emits
    * one triple per element, so the round-trip holds). */
  def emitEntity(name: String, entityType: String,
      props: Vector[(String, Vector[JVal])]): JObj = {
    val fields = Vector.newBuilder[(String, JVal)]
    fields += ("@type" -> JStr(entityType))
    fields += ("name" -> JStr(name))
    props.foreach { case (key, values) =>
      fields += (key -> (if (values.length == 1) values.head else JArr(values)))
    }
    JObj(fields.result())
  }

  /** Nested entity value: {"@type": t, "name": n} (the simple variant —
    * nested entities carry only a name, extractor.rs:14-117 spec). */
  def emitNested(name: String, entityType: String): JObj =
    JObj(Vector("@type" -> JStr(entityType), "name" -> JStr(name)))

  /** Document from entities, replicating merge_chunks' shape exactly
    * (extractor.rs:495-550): 0 entities → {"@context":...}; 1 → the
    * entity direct; n → @context + @graph array. */
  def emitDocument(entities: Vector[JObj]): JVal = {
    val ctx = "@context" -> JStr("https://schema.org/")
    entities match {
      case Vector() => JObj(Vector(ctx))
      case Vector(e) => JObj(ctx +: e.fields)
      case many => JObj(Vector(ctx, "@graph" -> JArr(many.map(identity))))
    }
  }

  /** Stage-1 DISCOVERY document — the GLiNER extractor's output shape
    * (gliner_extractor.rs:261-327): one entity → a single document with
    * @id "entity_<start>" and a _metadata provenance block; several →
    * @graph plus _extractionMetadata. Entities are (text, schemaType,
    * glinerType, confidence, start, end). */
  def emitDiscovery(entities: Vector[(String, String, String, Double, Int, Int)],
      sourceTextLength: Int, extractor: String = "rule-based-ner"): JVal = {
    def meta(text: String, glinerType: String, confidence: Double,
        start: Int, end: Int, withExtractor: Boolean): JObj = {
      val fields = Vector.newBuilder[(String, JVal)]
      fields += ("text" -> JStr(text))
      fields += ("startOffset" -> JNum(start.toString))
      fields += ("endOffset" -> JNum(end.toString))
      fields += ("confidence" -> JNum(confidence.toString))
      fields += ("glinerType" -> JStr(glinerType))
      if (withExtractor) fields += ("extractor" -> JStr(extractor))
      JObj(fields.result())
    }
    val ctx = "@context" -> JStr("https://schema.org/")
    entities match {
      case Vector((text, schemaType, glinerType, conf, start, end)) =>
        JObj(Vector(ctx,
          "@type" -> JStr(schemaType),
          "@id" -> JStr(s"entity_$start"),
          "name" -> JStr(text),
          "_metadata" -> meta(text, glinerType, conf, start, end, withExtractor = true)))
      case many =>
        val graph = many.map { case (text, schemaType, glinerType, conf, start, end) =>
          JObj(Vector(
            "@id" -> JStr(s"entity_$start"),
            "@type" -> JStr(schemaType),
            "name" -> JStr(text),
            "_metadata" -> meta(text, glinerType, conf, start, end, withExtractor = false)))
        }
        JObj(Vector(ctx,
          "@graph" -> JArr(graph.map(identity)),
          "_extractionMetadata" -> JObj(Vector(
            "extractor" -> JStr(extractor),
            "extractedEntities" -> JNum(many.length.toString),
            "sourceTextLength" -> JNum(sourceTextLength.toString)))))
    }
  }

  /** P6 selective normalization on the parsed tree: slug the ROOT
    * `name` only; preserve nested names (normalize.rs:98-142; goldens
    * normalize.rs:202-265). Returns the root name before/after. */
  def normalizeRootName(json: String): Option[(String, String)] =
    JsonParser.parse(json).toOption.flatMap {
      case o: JObj => o.get("name").flatMap(strOf).map(n => (n, Slug.slug(n)))
      case _ => None
    }
}
