from flink_rtcef_spark.cli import main

main()
