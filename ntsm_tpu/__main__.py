from ntsm_tpu.cli import main

raise SystemExit(main())
