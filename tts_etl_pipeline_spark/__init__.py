"""tts_etl_pipeline_spark — a PySpark-native batch/streaming ETL engine.

Re-expresses the data-processing capabilities of the reference
(OscarHill/tts-etl-pipeline, a single-process audio ETL script:
``process_audio.py``) as an idiomatic Spark design — DataFrame/SQL plans
optimized by Catalyst, pandas UDFs only for genuinely non-relational kernels
(DSP, ASR), Structured Streaming for continuous ingest — and extends it with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for ~100 TB scale.

Layout:
    sources/    table loaders, binary-file audio source, sinks (insert-or-ignore)
    operators/  relational queries, dedup, similarity, text analysis, audio pipeline
    functions/  reusable column expressions (decimal-exact aggs, vector math, text)
    plans/      plan-inspection helpers (explain, shuffle counts)
    streaming/  Structured Streaming versions of the event pipeline
"""

__version__ = "0.1.0"
