from cmoncrawl_spark.cli import main

main()
