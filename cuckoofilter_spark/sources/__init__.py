from cuckoofilter_spark.sources.tokens import synth_tokens_df, write_synth_tokens

__all__ = ["synth_tokens_df", "write_synth_tokens"]
