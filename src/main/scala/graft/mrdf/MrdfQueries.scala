package graft.mrdf

import graft.Declared

/** MRDF declared queries — filled in once graft.mrdf.Mrdf lands
  * (seeded/approximate ⇒ rows-only driver check; quality is asserted by
  * the recall ScalaTest per SURVEY.md §5.4). */
object MrdfQueries {
  val declared: Seq[Declared] = Seq.empty
}
