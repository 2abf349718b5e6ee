package graft.rdf

import Json._

/** RDF/JSON parser — the `.rj` media type `application/rdf+json`
  * (W3C Working Group Note "RDF 1.1 JSON Alternate Serialization",
  * 2014). Closes the last format-breadth delta against the
  * reference's Rio extension dispatch
  * (/root/reference/src/main/scala/es/jolivar/scio/sparql/TriplesReader.scala:62-74).
  *
  * Shape — subjects out, predicates in, object arrays innermost:
  * {{{
  * { "http://x/s": { "http://x/p": [
  *     {"value": "http://x/o", "type": "uri"},
  *     {"value": "chat",  "type": "literal", "lang": "fr"},
  *     {"value": "5",     "type": "literal",
  *      "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
  *     {"value": "b1",    "type": "bnode"} ] } }
  * }}}
  * Subject keys are IRIs or `_:label` blank nodes (labels kept
  * verbatim, like the Turtle parser). The format is triples-only (no
  * named graphs). Deviations fail loudly with the offending
  * subject/predicate in the message — the reference's silent
  * zero-statement behavior on undecodable input is exactly what this
  * repo refuses to reproduce. */
object RdfJsonParser {

  def parse(text: String): Seq[Quad] = {
    val out = Vector.newBuilder[Quad]
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"RDF/JSON parse error: $msg")

    val root = new JsonReader(text).parseDocument() match {
      case o: JObj => o
      case other => fail(s"document root must be an object, got $other")
    }
    def subjTerm(s: String): Term =
      if (s.startsWith("_:")) BNode(s.drop(2)) else Iri(s)

    def objTerm(subj: String, pred: String, v: J): Term = v match {
      case o: JObj =>
        val value = o.get("value") match {
          case Some(JStr(s)) => s
          case other => fail(
            s"object of <$subj> <$pred> needs a string \"value\", got $other")
        }
        o.get("type") match {
          case Some(JStr("uri")) => Iri(value)
          case Some(JStr("bnode")) =>
            // the Note writes bnode VALUES with the _: prefix
            // ("_:id"); tolerate the bare label some emitters produce
            BNode(if (value.startsWith("_:")) value.drop(2) else value)
          case Some(JStr("literal")) =>
            val lang = o.get("lang") match {
              case Some(JStr(l)) => l
              case None => ""
              case other => fail(
                s"object of <$subj> <$pred>: \"lang\" must be a string, got $other")
            }
            val dt = o.get("datatype") match {
              case Some(JStr(d)) => Some(d)
              case None => None
              case other => fail(
                s"object of <$subj> <$pred>: \"datatype\" must be a string, got $other")
            }
            if (lang.nonEmpty && dt.exists(_ != XSD.langString)) fail(
              s"object of <$subj> <$pred> carries both lang and datatype")
            if (lang.nonEmpty) Lit(value, lang = lang)
            else Lit(value, dt.getOrElse(XSD.string))
          case Some(JStr(t)) => fail(
            s"object of <$subj> <$pred> has unknown type \"$t\" " +
              "(expected uri | literal | bnode)")
          case _ => fail(s"object of <$subj> <$pred> needs a \"type\"")
        }
      case other => fail(
        s"objects of <$subj> <$pred> must be value objects, got $other")
    }

    root.fields.foreach { case (subj, preds) =>
      val s = subjTerm(subj)
      preds match {
        case p: JObj => p.fields.foreach { case (pred, objs) =>
          objs match {
            case JArr(items) =>
              if (items.isEmpty) fail(
                s"<$subj> <$pred> has an empty object array")
              items.foreach(v => out += Quad(s, Iri(pred), objTerm(subj, pred, v), None))
            case other => fail(
              s"<$subj> <$pred> must map to an ARRAY of value objects, got $other")
          }
        }
        case other => fail(
          s"subject <$subj> must map to a predicate object, got $other")
      }
    }
    out.result()
  }
}
