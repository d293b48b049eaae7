"""Primary application file for `spark-submit --py-files dude_spark.zip`.

spark-submit takes an application FILE, not a module (`python -m` has no
spark-submit equivalent), so the packaging contract is: ship the package
as a zip plus this launcher, which resolves `dude_spark` from the
--py-files zip on both the driver and the executors:

    python -c "import shutil; shutil.make_archive('dude_spark', 'zip', '<repo>', 'dude_spark')"
    spark-submit --py-files dude_spark.zip scripts/submit_driver.py run \
        --input <table> --checkpoint <dir> --results <dir> \
        --detectors exact,minhash,simhash,suffix

Exercised end-to-end (subprocess spark-submit, repo off sys.path) by
tests/test_submit.py.
"""

import sys

from dude_spark.cli import main

sys.exit(main())
