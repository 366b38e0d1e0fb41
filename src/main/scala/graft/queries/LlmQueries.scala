package graft.queries

object LlmQueries {
  def all: Seq[HarnessQuery] = Seq.empty
}
