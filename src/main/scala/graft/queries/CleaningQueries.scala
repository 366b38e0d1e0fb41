package graft.queries

object CleaningQueries {
  def all: Seq[HarnessQuery] = Seq.empty
}
