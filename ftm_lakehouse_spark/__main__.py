from ftm_lakehouse_spark.cli import main

raise SystemExit(main())
