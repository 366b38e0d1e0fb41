package graft.queries

object EdaQueries {
  def all: Seq[HarnessQuery] = Seq.empty
}
