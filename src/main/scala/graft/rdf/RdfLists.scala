package graft.rdf

/** Shared RDF list (rdf:first/rest chain) construction — one encoding
  * used by every parser that deserializes a collection (Turtle `(…)`,
  * JSON-LD `@list`). */
object RdfLists {

  /** Emit the chain triples for `items` via `emit`; returns the list
    * head term (rdf:nil for an empty list). */
  def chain(items: Seq[Term], freshBNode: () => BNode,
            emit: (Term, Term, Term) => Unit): Term =
    if (items.isEmpty) Iri(RDF.nil)
    else {
      val cells = items.map(_ => freshBNode())
      cells.zipWithIndex.foreach { case (cell, i) =>
        emit(cell, Iri(RDF.first), items(i))
        emit(cell, Iri(RDF.rest),
          if (i + 1 < cells.size) cells(i + 1) else Iri(RDF.nil))
      }
      cells.head
    }
}
