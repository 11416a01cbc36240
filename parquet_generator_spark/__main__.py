from parquet_generator_spark.cli import main

raise SystemExit(main())
