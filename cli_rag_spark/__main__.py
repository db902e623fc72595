from cli_rag_spark.cli import main

raise SystemExit(main())
