from instacart_next_order_recommendation_tpu.baselines.run_baselines import main

main()
