package graft.rdf

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** RDF/XML parser (driver-side, StAX — no DOM allocation for large
  * files) covering the subset that real-world dumps use.
  *
  * Reference equivalent: Rio's RDFXMLParser selected by filename
  * (/root/reference/src/main/scala/es/jolivar/scio/sparql/TriplesReader.scala:62-74).
  * Supported: rdf:Description and typed node elements, rdf:about /
  * rdf:ID / rdf:nodeID / anonymous nodes, rdf:resource object refs,
  * literal property elements with rdf:datatype / xml:lang (inherited
  * from ancestors), nested node elements, rdf:parseType="Resource",
  * rdf:parseType="Collection" (rdf:first/rest chain via [[RdfLists]]),
  * rdf:li container membership (expanded to rdf:_1, rdf:_2, … with a
  * per-element counter per spec §7.4), property attributes, xml:base
  * for relative IRI resolution.
  * Unsupported (loud error, not silent drop): rdf:parseType="Literal",
  * reification sugar.
  */
object RdfXmlParser {

  private val RDF_NS = RDF.ns

  def parse(text: String): Seq[Quad] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    // harden against XXE: RDF/XML from the wild must not read local
    // files or fetch DTDs through the parser
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new java.io.StringReader(text))
    val out = Vector.newBuilder[Quad]
    var bnodeCounter = 0L
    def freshBNode(): BNode = { bnodeCounter += 1; BNode(s"rx$bnodeCounter") }
    val nodeIds = scala.collection.mutable.Map.empty[String, BNode]
    def namedBNode(id: String): BNode =
      nodeIds.getOrElseUpdate(id, freshBNode())

    def attr(ns: String, local: String): Option[String] = {
      var i = 0
      var res: Option[String] = None
      while (i < r.getAttributeCount && res.isEmpty) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        if (ans == ns && r.getAttributeLocalName(i) == local)
          res = Some(r.getAttributeValue(i))
        i += 1
      }
      res
    }

    // one IRI-resolution implementation for all graft.rdf parsers
    def resolve(iri: String, base: String): String =
      if (iri.isEmpty) base else TurtleParser.resolveIri(base, iri)

    /** Property attributes (any non-rdf, non-xml attribute on a node
      * element) are literal-triple shorthand. */
    def propertyAttrTriples(subj: Term, base: String, lang: String): Unit = {
      var i = 0
      while (i < r.getAttributeCount) {
        val ns = Option(r.getAttributeNamespace(i)).getOrElse("")
        val local = r.getAttributeLocalName(i)
        val isRdfSyntax = ns == RDF_NS &&
          Set("about", "ID", "nodeID", "resource", "datatype", "parseType").contains(local)
        val isXml = ns == "http://www.w3.org/XML/1998/namespace" || ns == "" && local == "xmlns"
        if (!isRdfSyntax && !isXml && ns.nonEmpty) {
          if (ns == RDF_NS && local == "type")
            out += Quad(subj, Iri(RDF.typ), Iri(resolve(r.getAttributeValue(i), base)), None)
          else
            out += Quad(subj, Iri(ns + local),
              Lit(r.getAttributeValue(i), lang = lang), None)
        }
        i += 1
      }
    }

    /** Parse a node element (cursor ON its START_ELEMENT); returns its
      * subject term; consumes through its END_ELEMENT. */
    def parseNode(base0: String, lang0: String): Term = {
      val base = attr("http://www.w3.org/XML/1998/namespace", "base").map(b => resolve(b, base0)).getOrElse(base0)
      val lang = attr("http://www.w3.org/XML/1998/namespace", "lang").getOrElse(lang0)
      val subj: Term =
        attr(RDF_NS, "about").map(a => Iri(resolve(a, base)))
          .orElse(attr(RDF_NS, "ID").map(id => Iri(resolve("#" + id, base))))
          .orElse(attr(RDF_NS, "nodeID").map(namedBNode))
          .getOrElse(freshBNode())
      // typed node element: <ns:Type> == rdf:type triple
      val ns = Option(r.getNamespaceURI).getOrElse("")
      val local = r.getLocalName
      if (ns.isEmpty)
        throw new IllegalArgumentException(
          s"node element <$local> has no namespace — its type IRI would be relative")
      if (!(ns == RDF_NS && local == "Description"))
        out += Quad(subj, Iri(RDF.typ), Iri(ns + local), None)
      propertyAttrTriples(subj, base, lang)
      // children are property elements; rdf:li numbering restarts per
      // node element (RDF/XML spec §7.4)
      val liCtr = Array(0)
      var depth = 1
      while (depth > 0 && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            parseProperty(subj, base, lang, liCtr); // consumes through its end
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ => ()
        }
      }
      subj
    }

    /** Parse a property element (cursor ON its START_ELEMENT);
      * consumes through its END_ELEMENT. */
    def parseProperty(subj: Term, base0: String, lang0: String,
                      liCtr: Array[Int]): Unit = {
      val base = attr("http://www.w3.org/XML/1998/namespace", "base").map(b => resolve(b, base0)).getOrElse(base0)
      val lang = attr("http://www.w3.org/XML/1998/namespace", "lang").getOrElse(lang0)
      val ns = Option(r.getNamespaceURI).getOrElse("")
      if (ns.isEmpty)
        throw new IllegalArgumentException(
          s"property element <${r.getLocalName}> has no namespace — " +
            "its predicate IRI would be relative")
      val pred =
        if (ns == RDF_NS && r.getLocalName == "li") {
          liCtr(0) += 1
          Iri(RDF_NS + "_" + liCtr(0)) // container membership property
        } else Iri(ns + r.getLocalName)
      if (attr(RDF_NS, "ID").isDefined)
        throw new IllegalArgumentException(
          "rdf:ID reification on property elements not supported")
      val resourceAttr = attr(RDF_NS, "resource")
      val nodeIdAttr = attr(RDF_NS, "nodeID")
      val dtAttr = attr(RDF_NS, "datatype")
      val parseType = attr(RDF_NS, "parseType")

      parseType match {
        case Some("Resource") =>
          // anonymous node whose property elements nest directly
          val b = freshBNode()
          out += Quad(subj, pred, b, None)
          val childLiCtr = Array(0)
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT => parseProperty(b, base, lang, childLiCtr)
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ => ()
            }
          }
        case Some("Collection") =>
          // child node elements become an rdf:first/rest chain, same
          // shared encoding as Turtle `(…)` and JSON-LD @list
          val items = Vector.newBuilder[Term]
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                items += parseNode(base, lang)
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ => ()
            }
          }
          val head = RdfLists.chain(items.result(), () => freshBNode(),
            (s, p, o) => out += Quad(s, p, o, None))
          out += Quad(subj, pred, head, None)
        case Some(other) =>
          throw new IllegalArgumentException(
            s"""rdf:parseType="$other" not supported""")
        case None if resourceAttr.isDefined =>
          out += Quad(subj, pred, Iri(resolve(resourceAttr.get, base)), None)
          skipToEnd()
        case None if nodeIdAttr.isDefined =>
          out += Quad(subj, pred, namedBNode(nodeIdAttr.get), None)
          skipToEnd()
        case None =>
          // either a text literal or one nested node element
          val text = new StringBuilder
          var obj: Option[Term] = None
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
                text.append(r.getText)
              case XMLStreamConstants.START_ELEMENT =>
                if (obj.isDefined) throw new IllegalArgumentException(
                  "property element contains more than one nested node element " +
                    "(only rdf:parseType=\"Collection\" may hold several)")
                obj = Some(parseNode(base, lang))
              case XMLStreamConstants.END_ELEMENT => done = true
              case _ => ()
            }
          }
          obj match {
            case Some(o) => out += Quad(subj, pred, o, None)
            case None =>
              val l = dtAttr match {
                case Some(dt) => Lit(text.toString, resolve(dt, base))
                case None => Lit(text.toString, lang = lang)
              }
              out += Quad(subj, pred, l, None)
          }
      }
    }

    def skipToEnd(): Unit = {
      var depth = 1
      while (depth > 0 && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => depth += 1
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ => ()
        }
      }
    }

    // drive: find rdf:RDF (or a single top-level node element) and
    // parse its node-element children
    var rootSeen = false
    var rootBase = ""
    var rootLang = ""
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val ns = Option(r.getNamespaceURI).getOrElse("")
          if (!rootSeen && ns == RDF_NS && r.getLocalName == "RDF") {
            rootSeen = true // children handled by the loop
            rootBase = attr("http://www.w3.org/XML/1998/namespace", "base").getOrElse("")
            rootLang = attr("http://www.w3.org/XML/1998/namespace", "lang").getOrElse("")
          } else {
            parseNode(rootBase, rootLang) // top-level node element
          }
        case _ => ()
      }
    }
    r.close()
    out.result()
  }
}
