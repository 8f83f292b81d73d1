from esop_spark.cli import main

raise SystemExit(main())
