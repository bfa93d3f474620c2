from sftp_data_ingestion_spark.cli import main

raise SystemExit(main())
