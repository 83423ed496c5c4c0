"""Data Prepper processor equivalents, Spark-first.

Each module maps a family of reference plugins (SURVEY.md §2) onto
declarative DataFrame transformations so Catalyst can optimize them —
predicate pushdown, column pruning, whole-stage codegen.  None of these
use per-row Python; the only pandas UDFs live in the index build and the
training-data ops where Spark has no builtin.

  mutate      — add/copy/rename/delete/convert/translate/list_to_map (§2.3, §2.5)
  strings     — substitute/split/case/trim/key_value/csv/grok/obfuscate (§2.5)
  dates       — multi-pattern date parsing → ISO-8601 (§2.5 `date`)
  aggregate   — count/histogram/put_all/append/remove_duplicates/
                percent_sampler/rate_limiter/tail_sampler (§2.6), service_map (§2.7)
  routing     — conditional routes → tagged filtered frames (§2.3)
"""
