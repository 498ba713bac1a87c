from filemap_spark.cli import main

raise SystemExit(main())
