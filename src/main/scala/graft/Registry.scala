package graft

/** Single place where every implemented operator's QueryDef is collected so
  * SparkEntry (the driver contract) and the ScalaTest specs see the same
  * inventory. Adding an operator = adding its defs here.
  */
object Registry {
  def all: Seq[QueryDef] =
    operators.InvertedIndex.defs ++
      operators.Relational.defs ++
      operators.Advanced.defs ++
      operators.Scalars.defs ++
      operators.TimeWindows.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.Pipeline.defs ++
      sources.Interchange.defs ++
      streaming.StreamReplay.defs

  def byName(name: String): QueryDef =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no query named $name"))
}
