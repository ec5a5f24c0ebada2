"""spark-submit main file: thin wrapper over datacapsule_spark.pipeline.

Shipped separately from the zipped package because spark-submit wants a
primary .py file; all logic lives in the --py-files zip.
"""

from datacapsule_spark.pipeline import main

if __name__ == "__main__":
    main()
