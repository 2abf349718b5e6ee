package graft.rdf

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** TriX parser (StAX, no DOM) — the XML serialization of RDF datasets
  * (Carroll & Stickler, HP Labs TR HPL-2004-56).
  *
  * Reference equivalent: Rio's TriXParser selected by filename
  * (/root/reference/src/main/scala/es/jolivar/scio/sparql/TriplesReader.scala:62-74).
  *
  * Shape: `<TriX><graph><uri>g</uri><triple>s p o</triple>…</graph>…</TriX>`
  * where each term is one of `<uri>`, `<id>` (blank node label, kept
  * verbatim like Turtle's `_:label`), `<plainLiteral xml:lang="…"?>`,
  * `<typedLiteral datatype="…">`. A graph with no leading `<uri>`/`<id>`
  * is the default graph. Position rules enforced loudly: subjects are
  * uri|id, predicates uri-only, the graph name precedes the first
  * triple. Elements outside the TriX vocabulary error rather than
  * silently dropping data.
  */
object TriXParser {

  val NS = "http://www.w3.org/2004/03/trix/trix-1/"

  def parse(text: String): Seq[Quad] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    // same XXE hardening as RdfXmlParser: wild XML must not read local
    // files or fetch DTDs through the parser
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new java.io.StringReader(text))
    val out = Vector.newBuilder[Quad]

    def fail(msg: String): Nothing = {
      val loc = r.getLocation
      throw new IllegalArgumentException(
        s"TriX parse error at line ${loc.getLineNumber}: $msg")
    }

    def checkNs(): Unit = {
      // the spec namespace, or none for lenient hand-written files —
      // any OTHER namespace is a different vocabulary, not TriX
      val ns = Option(r.getNamespaceURI).getOrElse("")
      if (ns.nonEmpty && ns != NS)
        fail(s"element <${r.getLocalName}> in unexpected namespace $ns")
    }

    /** Text content of the current element; cursor moves to its
      * END_ELEMENT. Nested elements are malformed TriX. */
    def readText(): String = {
      val sb = new StringBuilder
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            sb.append(r.getText)
          case XMLStreamConstants.START_ELEMENT =>
            fail(s"unexpected nested element <${r.getLocalName}>")
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      sb.toString
    }

    /** Term element (cursor ON its START_ELEMENT); consumes through its
      * END_ELEMENT. IRIs and blank-node labels trim surrounding
      * whitespace (pretty-printed TriX indents them); literal lexical
      * forms are preserved exactly. */
    def parseTerm(): Term = {
      checkNs()
      r.getLocalName match {
        case "uri" => Iri(readText().trim)
        case "id" =>
          val label = readText().trim
          if (label.isEmpty) fail("<id> blank node label is empty")
          BNode(label)
        case "plainLiteral" =>
          val lang = Option(r.getAttributeValue(
            "http://www.w3.org/XML/1998/namespace", "lang")).getOrElse("")
          Lit(readText(), lang = lang)
        case "typedLiteral" =>
          val dt = Option(r.getAttributeValue(null, "datatype"))
            .getOrElse(fail("<typedLiteral> missing required datatype attribute"))
          Lit(readText(), dt)
        case other => fail(s"unexpected term element <$other> " +
          "(expected uri | id | plainLiteral | typedLiteral)")
      }
    }

    /** `<triple>` element (cursor ON its START_ELEMENT). */
    def parseTriple(graph: Option[Term]): Unit = {
      val terms = Vector.newBuilder[Term]
      var n = 0
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            terms += parseTerm(); n += 1
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
      if (n != 3) fail(s"<triple> has $n term elements, expected 3")
      val ts = terms.result()
      val (s, p, o) = (ts(0), ts(1), ts(2))
      s match {
        case _: Lit => fail("triple subject is a literal")
        case _ => ()
      }
      p match {
        case _: Iri => ()
        case _ => fail("triple predicate must be a <uri>")
      }
      out += Quad(s, p, o, graph)
    }

    /** `<graph>` element (cursor ON its START_ELEMENT): an optional
      * name term, then triples. */
    def parseGraph(): Unit = {
      var name: Option[Term] = None
      var sawTriple = false
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            checkNs()
            r.getLocalName match {
              case "triple" => sawTriple = true; parseTriple(name)
              case "uri" | "id" =>
                if (sawTriple) fail("graph name must precede its triples")
                if (name.isDefined) fail("graph has more than one name")
                name = Some(parseTerm())
              case other => fail(s"unexpected element <$other> in <graph>")
            }
          case XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
    }

    var rootSeen = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          checkNs()
          r.getLocalName match {
            case "TriX" | "trix" =>
              if (rootSeen) fail("nested <TriX> root")
              rootSeen = true
            case "graph" =>
              if (!rootSeen) fail("<graph> outside <TriX> root")
              parseGraph()
            case other =>
              fail(s"unexpected element <$other> " +
                (if (rootSeen) "(expected <graph>)" else "(expected <TriX> root)"))
          }
        case _ => ()
      }
    }
    r.close()
    if (!rootSeen) fail("no <TriX> root element found")
    out.result()
  }
}
