from hrdp_variant_load_pipeline_spark.cli import main

raise SystemExit(main())
