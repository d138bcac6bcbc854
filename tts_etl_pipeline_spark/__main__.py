from tts_etl_pipeline_spark.cli import main

raise SystemExit(main())
