package graft.rdf

import scala.collection.mutable

/** JSON-LD parser (driver-side) for the subset real corpora use.
  *
  * Reference equivalent: Rio's JSONLDParser selected by filename
  * (TriplesReader.scala:62-74). Supported: `@context` term definitions
  * (string mappings, prefix expansion, `{"@id":…, "@type":…}` with
  * `@id`/datatype coercion, `@vocab`, `@base`, default `@language`),
  * node objects with `@id` / blank nodes (`_:…` or anonymous),
  * `@type` (string or array) → rdf:type, value objects
  * (`@value`/`@type`/`@language`), node references, nested nodes,
  * arrays, JSON literals (number → xsd:integer/xsd:double, boolean →
  * xsd:boolean), `@list` (→ rdf:first/rest chains), top-level
  * `@graph`, named graphs (node with both `@id` and `@graph`), and
  * `@container` term definitions: `@list` (values become one chain),
  * `@set` (default array semantics), `@language` (lang→text maps),
  * `@index` (index keys dropped per the expansion algorithm).
  * Unsupported (loud error): `@reverse`, `@container` `@id`/`@type`/
  * `@graph` maps, `@included`, `@nest`, keyword aliases.
  *
  * Keys that expand to no IRI (no context mapping, no `@vocab`) are
  * dropped per the JSON-LD expansion algorithm.
  */
object JsonLdParser {

  import Json._

  // ----- JSON-LD expansion -----
  private final case class TermDef(iri: String, coercion: Option[String],
                                   language: Option[String],
                                   container: Option[String] = None)
  private final case class Ctx(terms: Map[String, TermDef], vocab: Option[String],
                               base: Option[String], lang: Option[String]) {
    def expandIri(s: String, forProperty: Boolean): Option[String] = {
      if (s.startsWith("@")) return None // keyword
      terms.get(s) match {
        case Some(td) => Some(td.iri)
        case None =>
          val colon = s.indexOf(':')
          if (colon > 0) {
            val prefix = s.substring(0, colon)
            val suffix = s.substring(colon + 1)
            if (suffix.startsWith("//")) Some(s) // absolute IRI
            else terms.get(prefix) match {
              case Some(td) => Some(td.iri + suffix)
              case None => Some(s) // e.g. urn:x, mailto:x
            }
          }
          else if (forProperty) vocab.map(_ + s) // term w/o mapping: @vocab or drop
          else Some(base.map(b =>
            try new java.net.URI(b).resolve(s).toString
            catch { case _: Exception => s }).getOrElse(s))
      }
    }
  }
  private val emptyCtx = Ctx(Map.empty, None, None, None)

  private def asArray(j: J): Vector[J] = j match {
    case JArr(is) => is
    case other => Vector(other)
  }

  private def parseContext(parent: Ctx, j: J): Ctx = j match {
    case JNull => emptyCtx
    case JArr(items) => items.foldLeft(parent)(parseContext)
    case JObj(fields) =>
      var vocab = parent.vocab; var base = parent.base; var lang = parent.lang
      val terms = mutable.Map.empty[String, TermDef] ++= parent.terms
      // two passes so prefix definitions can reference each other
      (1 to 2).foreach { _ =>
        fields.foreach {
          case ("@vocab", JStr(v)) => vocab = Some(v)
          case ("@base", JStr(b)) => base = Some(b)
          case ("@base", JNull) => base = None
          case ("@language", JStr(l)) => lang = Some(l.toLowerCase)
          case ("@language", JNull) => lang = None
          case ("@version", _) => ()
          case (term, JStr(iri)) =>
            if (iri.startsWith("@"))
              // keyword aliases ("id": "@id") would otherwise corrupt
              // subjects silently — reject per the loud-error contract
              throw new IllegalArgumentException(
                s"""keyword alias "$term": "$iri" not supported""")
            val tmp = Ctx(terms.toMap, vocab, base, lang)
            terms(term) = TermDef(tmp.expandIri(iri, forProperty = true)
              .getOrElse(iri), None, None)
          case (term, o: JObj) =>
            val tmp = Ctx(terms.toMap, vocab, base, lang)
            val id = o.get("@id") match {
              case Some(JStr(i)) => tmp.expandIri(i, forProperty = true).getOrElse(i)
              case _ => vocab.map(_ + term).getOrElse(term)
            }
            val coercion = o.get("@type") match {
              case Some(JStr("@id")) => Some("@id")
              case Some(JStr(dt)) => Some(tmp.expandIri(dt, forProperty = true).getOrElse(dt))
              case _ => None
            }
            // @container: single keyword or an array (1.1 allows
            // combining with @set, which adds nothing here)
            val container = o.get("@container") match {
              case None => None
              case Some(c) =>
                val kws = asArray(c).map {
                  case JStr(k) => k
                  case other =>
                    throw new IllegalArgumentException(s"bad @container $other")
                }.filterNot(_ == "@set")
                kws match {
                  case Vector() => Some("@set")
                  case Vector(k @ ("@list" | "@language" | "@index")) => Some(k)
                  case other =>
                    throw new IllegalArgumentException(
                      s"@container ${other.mkString(",")} not supported")
                }
            }
            val language = o.get("@language") match {
              case Some(JStr(l)) => Some(l.toLowerCase)
              case _ => None
            }
            terms(term) = TermDef(id, coercion, language, container)
          case (term, JNull) => terms.remove(term)
          case (term, other) =>
            throw new IllegalArgumentException(
              s"unsupported context entry $term: $other")
        }
      }
      Ctx(terms.toMap, vocab, base, lang)
    case other =>
      throw new IllegalArgumentException(s"unsupported @context: $other")
  }

  def parse(text: String): Seq[Quad] = {
    val doc = new JsonReader(text).parseDocument()
    val out = Vector.newBuilder[Quad]
    var bn = 0L
    val bnodeIds = mutable.Map.empty[String, BNode]
    def freshBNode(): BNode = { bn += 1; BNode(s"jb$bn") }
    def namedBNode(label: String): BNode =
      bnodeIds.getOrElseUpdate(label, freshBNode())

    def nodeId(ctx: Ctx, s: String): Term =
      if (s.startsWith("_:")) namedBNode(s.stripPrefix("_:"))
      else Iri(ctx.expandIri(s, forProperty = false).getOrElse(s))

    /** Number → RDF literal per JSON-LD: integral → xsd:integer,
      * otherwise xsd:double (lexical = Java double form, matching the
      * engine's own double formatting). */
    def numLit(raw: String): Lit =
      if (raw.forall(c => c.isDigit || c == '-')) Lit(raw, XSD.integer)
      else Lit(java.lang.Double.toString(raw.toDouble), XSD.double)

    /** Emit triples for one node object; returns its subject. */
    def processNode(ctx0: Ctx, obj: JObj, graph: Option[Term]): Term = {
      val ctx = obj.get("@context").map(parseContext(ctx0, _)).getOrElse(ctx0)
      val subj: Term = obj.get("@id") match {
        case Some(JStr(s)) => nodeId(ctx, s)
        case _ => freshBNode()
      }
      obj.fields.foreach {
        case ("@context", _) | ("@id", _) => ()
        case ("@type", v) => asArray(v).foreach {
          case JStr(t) =>
            out += Quad(subj, Iri(RDF.typ),
              Iri(ctx.expandIri(t, forProperty = true).getOrElse(t)), graph)
          case o => throw new IllegalArgumentException(s"bad @type $o")
        }
        case ("@graph", v) =>
          // node with @id + @graph: contents land in that named graph
          val g = subj match {
            case _: BNode if obj.get("@id").isEmpty => graph // anonymous wrapper
            case s => Some(s)
          }
          asArray(v).foreach {
            case o: JObj => processNode(ctx, o, g)
            case o => throw new IllegalArgumentException(s"bad @graph entry $o")
          }
        case (k, _) if k.startsWith("@") =>
          throw new IllegalArgumentException(s"unsupported keyword $k")
        case (key, value) =>
          val td = ctx.terms.get(key)
          ctx.expandIri(key, forProperty = true).foreach { predIri =>
            val pred = Iri(predIri)
            def emit(o: Term): Unit = out += Quad(subj, pred, o, graph)
            /** The object term of one value (emitting any nested-node
              * triples as a side effect); None = null value. */
            def objTerm(v: J): Option[Term] = v match {
              case JStr(s) => td.flatMap(_.coercion) match {
                case Some("@id") => Some(nodeId(ctx, s))
                case Some(dt) => Some(Lit(s, dt))
                case None =>
                  val lang = td.flatMap(_.language).orElse(ctx.lang)
                  Some(lang.map(l => Lit(s, lang = l)).getOrElse(Lit(s)))
              }
              case JNum(raw) => Some(numLit(raw))
              case JBool(b) => Some(Lit(b.toString, XSD.boolean))
              case JNull => None // null value → no triple
              case JArr(_) =>
                throw new IllegalArgumentException("nested arrays not supported")
              case o: JObj =>
                if (o.get("@reverse").isDefined)
                  throw new IllegalArgumentException("@reverse not supported")
                (o.get("@value"), o.get("@id")) match {
                  case (Some(v0), _) =>
                    val lex = v0 match {
                      case JStr(s) => s
                      case JNum(raw) => raw
                      case JBool(b) => b.toString
                      case other =>
                        throw new IllegalArgumentException(s"bad @value $other")
                    }
                    (o.get("@type"), o.get("@language")) match {
                      case (Some(JStr(dt)), _) =>
                        Some(Lit(lex, ctx.expandIri(dt, forProperty = true).getOrElse(dt)))
                      case (_, Some(JStr(l))) => Some(Lit(lex, lang = l))
                      case (_, Some(JNull)) =>
                        // explicit "@language": null opts this value
                        // OUT of the context default language — a
                        // plain literal, not ctx.lang
                        Some(Lit(lex))
                      case _ => v0 match {
                        case JNum(raw) => Some(numLit(raw))
                        case JBool(b) => Some(Lit(b.toString, XSD.boolean))
                        case _ => Some(ctx.lang.map(l => Lit(lex, lang = l))
                          .getOrElse(Lit(lex)))
                      }
                    }
                  case (None, Some(JStr(id)))
                      if o.fields.forall(f => f._1 == "@id" || f._1 == "@context") =>
                    // pure node reference (only @id, maybe @context);
                    // anything else carries its own triples → full node
                    Some(nodeId(ctx, id))
                  case _ => Some(processNode(ctx, o, graph)) // nested node
                }
            }
            /** JSON-LD deserialize-list algorithm: rdf:first/rest chain. */
            def listTerm(items: Vector[J]): Term =
              RdfLists.chain(items.flatMap(objTerm), freshBNode,
                (s, p, o) => out += Quad(s, p, o, graph))
            def processValue(v: J): Unit = v match {
              case JArr(items) => items.foreach(processValue)
              case o: JObj if o.get("@list").isDefined =>
                emit(listTerm(asArray(o.get("@list").get)))
              case other => objTerm(other).foreach(emit)
            }
            td.flatMap(_.container) match {
              case Some("@list") => value match {
                // an explicit {"@list": …} value keeps its own shape
                case o: JObj if o.get("@list").isDefined => processValue(o)
                case v => emit(listTerm(asArray(v)))
              }
              case Some("@language") => value match {
                case JObj(fs) => fs.foreach { case (lang, v) =>
                  asArray(v).foreach {
                    case JStr(s) =>
                      if (lang == "@none") emit(Lit(s))
                      else emit(Lit(s, lang = lang.toLowerCase))
                    case JNull => ()
                    case other => throw new IllegalArgumentException(
                      s"language map values must be strings, got $other")
                  }
                }
                case other => throw new IllegalArgumentException(
                  s"@container @language expects a map, got $other")
              }
              case Some("@index") => value match {
                // index keys carry no RDF meaning — values pass through
                case JObj(fs) => fs.foreach { case (_, v) => processValue(v) }
                case v => processValue(v)
              }
              case _ => processValue(value)
            }
          }
      }
      subj
    }

    doc match {
      case o: JObj if o.get("@graph").isDefined && o.get("@id").isEmpty =>
        // a pure graph wrapper carries only @context/@graph; other
        // properties would expand to blank-node-subject triples this
        // parser does not produce — fail loudly rather than drop them
        val extra = o.fields.collect {
          case (k, _) if k != "@context" && k != "@graph" => k
        }
        if (extra.nonEmpty) throw new IllegalArgumentException(
          s"top-level @graph wrapper with extra properties ${extra.mkString(", ")} not supported")
        val ctx = o.get("@context").map(parseContext(emptyCtx, _)).getOrElse(emptyCtx)
        asArray(o.get("@graph").get).foreach {
          case n: JObj => processNode(ctx, n, None)
          case other => throw new IllegalArgumentException(s"bad @graph entry $other")
        }
      case o: JObj => processNode(emptyCtx, o, None)
      case JArr(items) => items.foreach {
        case n: JObj => processNode(emptyCtx, n, None)
        case other => throw new IllegalArgumentException(s"bad top-level entry $other")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported JSON-LD document: $other")
    }
    out.result()
  }
}
